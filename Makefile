# Native-code hygiene targets (SURVEY.md §5: the reference builds plain
# Release with no sanitizers; here the host C++ gets ASan/UBSan coverage).

NATIVE := bioseqdb_tpu/index/native

.PHONY: test native-sanitize clean

test:
	python -m pytest tests/ -q

# Build the native library under ASan+UBSan and run the native test
# driver against it (SA-IS vs random oracles + ksw_global cases).
native-sanitize:
	g++ -O1 -g -std=c++17 -fopenmp -fsanitize=address,undefined \
	    -fno-sanitize-recover=all \
	    -o /tmp/native_sanitize_check $(NATIVE)/sais.cpp $(NATIVE)/ksw.cpp \
	    $(NATIVE)/finalize1.cpp tools/native_check.cpp
	/tmp/native_sanitize_check

clean:
	rm -f $(NATIVE)/libsais_tpu.*.so
	rm -rf .jax_cache
