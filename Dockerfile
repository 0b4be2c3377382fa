# smallk-tpu container (counterpart of the reference Dockerfile, which
# built gcc-5 + libflame + Elemental + OpenBLAS + mpich; here the stack
# is jax + the optional native extension).
#
# For TPU VMs, swap the pip line for: pip install "jax[tpu]" scipy pytest

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir jax numpy scipy pytest

WORKDIR /opt/smallk-tpu
COPY . .

RUN python native/setup.py build_ext --inplace \
    && python -m pytest tests/ -q

ENV PYTHONPATH=/opt/smallk-tpu
CMD ["python", "-m", "smallk_tpu.cli.nmf_cli", "--help"]
