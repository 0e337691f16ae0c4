"""Convert a local HuggingFace convnext checkpoint dir to a plain
state-dict .pth (reference nips_benchmark/batch_eval_adv/
load_model.py:1-9, which pulls facebook/convnext-base-224).
Usage: python load_model.py <hf_dir> <out.pth>"""
import sys

import torch
from transformers import ConvNextForImageClassification

model = ConvNextForImageClassification.from_pretrained(sys.argv[1])
torch.save(model.state_dict(), sys.argv[2])
