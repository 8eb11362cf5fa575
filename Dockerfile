# panoptikon-tpu container image: ONE Python process (the aiohttp server
# hosting the gateway, API, PQL engine, jobs, and in-process JAX inference)
# with TWO listeners — a private admin listener (6342, full API) and a
# public restricted listener (6339, search/items/bookmarks ruleset), the
# same two-port posture as the reference deployment
# (/root/reference/Dockerfile, deploy/docker-compose.yml).
#
# Build:            docker build -t panoptikon-tpu .
# CPU smoke run:    docker run -p 127.0.0.1:6342:6342 panoptikon-tpu
# TPU VM run:       see docs/operations.md "TPU VM deployment" — pass the
#                   TPU runtime through and install the matching jax[tpu].
#
# The base image carries CPU jax only; on a TPU VM either build with
#   --build-arg ACCELERATOR=tpu
# (installs jax[tpu] from the libtpu releases index) or mount a venv that
# has it. Everything else in the image is identical across accelerators —
# the TPU/CPU split is a JAX platform choice, not a code path.

FROM python:3.12-slim AS runtime
ARG ACCELERATOR=cpu

WORKDIR /app
COPY pyproject.toml README.md ./
COPY panoptikon_tpu/ panoptikon_tpu/

RUN pip install --no-cache-dir . && \
    if [ "$ACCELERATOR" = "tpu" ]; then \
        pip install --no-cache-dir "jax[tpu]" \
            -f https://storage.googleapis.com/jax-releases/libtpu_releases.html; \
    fi

# Seed the config BEFORE declaring the volume: the classic (non-BuildKit)
# builder discards writes made to a path after its VOLUME instruction, and
# a missing config would silently fall back to a localhost-only default
# listener.
COPY deploy/docker-server.toml /config/server.toml

# Data (databases, thumbnails) and config live on volumes.
VOLUME ["/data", "/config"]

EXPOSE 6342 6339
ENV JAX_PLATFORMS=""
CMD ["python", "-m", "panoptikon_tpu.api.server", "--config", "/config/server.toml"]
