# Container recipe mirroring CI (the reference shipped a postgres:alpine
# image with the extension preinstalled, Dockerfile:5-10; this engine is
# a library+CLI, so the image just installs it and validates the hermetic
# suite). Not buildable inside the zero-egress dev sandbox; the commands
# are the same ones CI and `make test` run.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/bioseqdb-tpu
COPY . .
RUN pip install --no-cache-dir -e .[test]
# per-file pytest processes: the single-process invocation segfaults the
# XLA-CPU compiler at suite scale (~6 GB RSS; tools/run_tests.py:1-15)
RUN python tools/run_tests.py

ENTRYPOINT ["bioseqdb-tpu"]
