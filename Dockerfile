# Environment pinning for consent_tpu — the counterpart of the
# reference's Dockerfile (reference: Dockerfile:1-24, which pins
# ubuntu:16.04 + conda minimap2/fpa + the C++ toolchain).
#
# The TPU runtime itself comes from the host (libtpu / the platform
# plugin are provisioned with the accelerator, not installable from a
# generic image); this image pins everything else: the Python, JAX and
# numpy versions the framework is developed and benchmarked against,
# the g++ toolchain for the native host library (consent_tpu/native),
# and optional minimap2 (the built-in minimizer overlapper is used
# when it is absent — consent_tpu/overlap/minimizer.py).
FROM python:3.12-slim

RUN apt-get update && \
    apt-get install -y --no-install-recommends g++ make curl && \
    rm -rf /var/lib/apt/lists/*

# versions mirrored from the baked development environment
RUN pip install --no-cache-dir \
    "jax==0.9.0" \
    "numpy==2.0.2" \
    pytest

# optional: reference-identical overlapper (the native minimizer
# overlapper is the fallback; CONSENT-correct:185 uses minimap2)
# RUN apt-get install -y minimap2

COPY . /app
WORKDIR /app
RUN pip install --no-cache-dir -e .

# build the native host library once at image build (the ctypes loader
# would otherwise compile it lazily on first use)
RUN python -c "from consent_tpu import native; native.get_lib()"

ENTRYPOINT ["consent-correct"]
