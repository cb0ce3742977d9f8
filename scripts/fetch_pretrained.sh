#!/bin/bash
# Download the reference's pretrained torch checkpoint (HuggingFace,
# reference fetch_pretrained.sh) and convert it to this framework's
# format:
#   python -m viewfusion_tpu.utils.torch_convert \
#     ./logs/pretrained/best_model_all.pt ./logs/pretrained/
set -e
mkdir -p ./logs/pretrained
wget https://huggingface.co/bronemos/view-fusion/resolve/main/best_model_all.pt \
  -O ./logs/pretrained/best_model_all.pt
