#!/bin/bash
# Editable install (reference install.sh built an sdist; pip -e is the
# modern equivalent). Builds the native .so lazily on first import.
set -e
pip install -e .
python -c "import mgvae_tpu, deepgate; print('mgvae-tpu', mgvae_tpu.__version__, 'ok')"
