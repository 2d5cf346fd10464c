#!/bin/bash
# Build and (optionally) publish the gantts_tpu package (reference release.sh parity).
set -e
python -m pytest tests/ -q
GANTTS_TPU_RELEASE=1 python setup.py sdist
echo "sdist built under dist/; upload with: twine upload dist/*"
