#!/usr/bin/env bash
# Fetch the published DeepLIIF pretrained weights (Zenodo record 4751737,
# the same artifact the reference's Scripts/download_pre_trained_model.sh
# targets) and convert them to the native npz layout with `import-model`.
# Needs network access; in air-gapped environments copy the zip in and run
# with DEEPLIIF_SKIP_DOWNLOAD=1.
set -euo pipefail

CKPT_DIR=${1:-./checkpoints}
ZIP_URL='https://zenodo.org/record/4751737/files/DeepLIIF_Latest_Model.zip?download=1'
TORCH_DIR="$CKPT_DIR/DeepLIIF_Latest_Model"
NATIVE_DIR="$CKPT_DIR/DeepLIIF_Latest_Model_tpu"

mkdir -p "$CKPT_DIR"
if [[ -z "${DEEPLIIF_SKIP_DOWNLOAD:-}" ]]; then
    curl -L "$ZIP_URL" --output "$CKPT_DIR/DeepLIIF_Latest_Model.zip"
fi
python -c "import zipfile, sys; zipfile.ZipFile(sys.argv[1]).extractall(sys.argv[2])" \
    "$CKPT_DIR/DeepLIIF_Latest_Model.zip" "$CKPT_DIR"

# torch .pth -> native npz (runs the sum|diff|<=10 parity gate)
deepliif-tpu import-model --torch-dir "$TORCH_DIR" --output-dir "$NATIVE_DIR"

echo "Native model ready: $NATIVE_DIR"
echo "Pixel-parity gate vs shipped reference outputs:"
echo "  python -m pytest tests/test_golden_parity.py -q  (set DEEPLIIF_MODEL_DIR=$NATIVE_DIR)"
