"""Golden SAM fixtures: full SAM text equality on the staged-config-class
workloads (BASELINE.md). The north-star correctness gate is SAM equality
vs `bwa mem`; without a bwa binary in this environment the goldens pin
the pipeline's current output byte-for-byte so regressions in any stage
(seeding, chaining, extension, finalize, emission, tags) are detected.
Regenerate deliberately with tools/regen_golden.py after a justified
behavior change."""

import difflib
import os
import sys

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def assert_sam_equal(name: str, got: str):
    with open(os.path.join(GOLDEN_DIR, name)) as fh:
        want = fh.read()
    if got != want:
        diff = "\n".join(difflib.unified_diff(
            want.splitlines(), got.splitlines(),
            fromfile=f"golden/{name}", tofile="current", lineterm="", n=1,
        ))
        raise AssertionError(f"SAM text drifted from golden {name}:\n"
                             f"{diff[:4000]}")


def test_golden_sams():
    from tools.regen_golden import build_cases

    cases = build_cases()
    assert set(cases) == {"se_exact.sam", "se_mutated.sam", "pe_mutated.sam"}
    for name, text in cases.items():
        assert_sam_equal(name, text)


def test_golden_has_bwa_tagset():
    """The frozen records carry the bwa mem tag set in bwa's order."""
    with open(os.path.join(GOLDEN_DIR, "se_mutated.sam")) as fh:
        recs = [l for l in fh.read().splitlines() if not l.startswith("@")]
    mapped = [r for r in recs if not int(r.split("\t")[1]) & 0x4]
    assert mapped
    for r in mapped:
        tags = r.split("\t")[11:]
        keys = [t.split(":")[0] for t in tags]
        assert keys[:3] == ["NM", "MD", "AS"], keys
        if int(r.split("\t")[1]) & 0x100 == 0:  # primary: XS present
            assert "XS" in keys, r[:80]
