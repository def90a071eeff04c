#!/usr/bin/env bash
# Fetch the published DeepLIIF training/validation sets (Zenodo record
# 4751737, the same artifacts as the reference's
# Scripts/download_training_sets.sh) into the layout `deepliif-tpu train`
# expects: Datasets/Dataset1/{train,val}/ of stitched row PNGs.
set -euo pipefail

ROOT=${1:-./Datasets/Dataset1}
BASE='https://zenodo.org/record/4751737/files'

fetch_split() {
    local split=$1; shift
    local dir="$ROOT/$split"
    mkdir -p "$dir"
    for name in "$@"; do
        curl -L "$BASE/$name.zip?download=1" --output "$dir/$name.zip"
        python -c "import zipfile, sys; zipfile.ZipFile(sys.argv[1]).extractall(sys.argv[2])" \
            "$dir/$name.zip" "$dir"
        # flatten the zip's top-level folder
        if [[ -d "$dir/$name" ]]; then
            mv "$dir/$name"/*.png "$dir"/
            rmdir "$dir/$name" 2>/dev/null || true
        fi
        rm "$dir/$name.zip"
    done
    echo "$split: $(ls "$dir" | wc -l) images"
}

fetch_split train DeepLIIF_Training_Set BC-DeepLIIF_Training_Set
fetch_split val DeepLIIF_Validation_Set BC-DeepLIIF_Validation_Set

echo "Train: deepliif-tpu train --dataroot $ROOT --name my_model"
