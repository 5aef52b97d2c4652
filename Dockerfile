# ransacflow_tpu runtime image (the reference ships CUDA Dockerfiles; this
# is the TPU/CPU equivalent). For Cloud TPU VMs the libtpu wheel comes with
# the VM image; jax[tpu] below covers generic installs.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make curl && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax orbax-checkpoint chex einops numpy pillow pandas scipy \
    opencv-python-headless h5py pytest

WORKDIR /workspace
COPY . /workspace

# torch (CPU) is only needed to ingest the reference's .pth checkpoints
RUN pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

CMD ["python", "-m", "pytest", "tests/", "-x", "-q"]
