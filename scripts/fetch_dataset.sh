#!/bin/bash
# Download the NMR ShapeNet dataset (same public source the reference
# uses, fetch_dataset.sh), then shard it for training:
#   python -m viewfusion_tpu.data.prep -s ./data/nmr -d ./data/nmr
set -e
mkdir -p ./data/nmr
wget https://s3.eu-central-1.amazonaws.com/avg-projects/differentiable_volumetric_rendering/data/NMR_Dataset.zip \
  -O ./data/nmr/NMR_Dataset.zip
