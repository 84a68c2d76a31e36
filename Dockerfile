# acinoset-tpu runtime image.
# TPU access requires running on a TPU VM with the matching libtpu;
# the same image runs CPU-only for tests and host-side preprocessing.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make cmake \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/acinoset-tpu
COPY pyproject.toml README.md ./
COPY acinoset_tpu ./acinoset_tpu
COPY native ./native
COPY bench.py ./

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html || \
    pip install --no-cache-dir jax
RUN pip install --no-cache-dir .[plots,dev] opencv-python-headless
RUN make -C native

ENTRYPOINT ["python", "-m", "acinoset_tpu.cli"]
