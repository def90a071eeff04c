#!/usr/bin/env bash
# Fetch torchvision's Inception-V3 weights and convert them to the npz the
# FID/IS embedding hook consumes (DEEPLIIF_INCEPTION_NPZ). With this in
# place, `deepliif-tpu compute-statistics` FID/IS numbers are
# paper-comparable (pool3 features, the embedding the reference's
# DeepLIIF_Statistics/fid.py:303-334 uses).
set -euo pipefail

OUT=${1:-./inception_v3.npz}
PTH=$(mktemp /tmp/inception_XXXX.pth)
curl -L 'https://download.pytorch.org/models/inception_v3_google-0cc3c7bd.pth' \
    --output "$PTH"
python - "$PTH" "$OUT" <<'PY'
import sys
from deepliif_tpu.utils.torch_import import convert_inception_v3
convert_inception_v3(sys.argv[1], sys.argv[2])
print(f'wrote {sys.argv[2]}')
PY
rm "$PTH"
echo "export DEEPLIIF_INCEPTION_NPZ=$OUT"
