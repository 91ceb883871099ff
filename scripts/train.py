#!/usr/bin/env python
"""Training CLI — BasicSR-compatible: python scripts/train.py -opt <yml>
[--auto_resume] [--force_yml k:sub=v] [--launcher jax]."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from tpuir.train.options import parse_options
from tpuir.train.pipeline import train_pipeline


def main():
    root_path = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    opt, _ = parse_options(root_path, is_train=True)
    train_pipeline(root_path, opt)


if __name__ == "__main__":
    main()
