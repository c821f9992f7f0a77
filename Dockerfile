# TPU training/serving image (reference capability parity: Dockerfile —
# NGC torch + sox + ctcdecode build; here a JAX TPU base plus our native
# extensions built from source).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace/dsjax
COPY . .

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint chex numpy scipy pyyaml \
        python-Levenshtein pytest && \
    pip install --no-cache-dir -e . && \
    python -m dsjax.cpp.build

ENTRYPOINT []
CMD ["python", "train.py"]
