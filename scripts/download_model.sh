#!/usr/bin/env bash
# Fetch the PIFu reference checkpoints (net_G / net_C) into data/PIFu/
# (same artifacts as the reference's scripts/download_model.sh, which
# pulls them from Google Drive). After downloading, they load directly
# (monoport_tpu.convert.load_legacy_pifu) or can be converted to orbax
# with scripts/convert_model.py.
set -euo pipefail
mkdir -p data/PIFu
pip install --quiet gdown 2>/dev/null || true
gdown "https://drive.google.com/uc?id=1zEmVXG2VHy0MMzngcRshB4D8Sr_oLHsm" \
    -O data/PIFu/net_G
gdown "https://drive.google.com/uc?id=1V83B6GDIjYMfHdpg-KcCSAPgHxpafHgd" \
    -O data/PIFu/net_C
echo "checkpoints in data/PIFu/; convert with scripts/convert_model.py"
