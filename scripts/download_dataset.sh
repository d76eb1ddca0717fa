#!/usr/bin/env bash
# Fetch the AIShell-S0764 eval subset (the reference's WER dataset,
# model_convert/download_dataset.sh) for `python -m whisper_tpu.eval`.
# Run on a machine with network access.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p datasets
cd datasets
wget -nc https://github.com/ml-inory/whisper.axera/releases/download/v1.0/datasets.zip
unzip -n datasets.zip -d ./
echo "ground truth: $(pwd)/ground_truth.txt"
