#!/usr/bin/env python
"""Framework test CLI — BasicSR-compatible: python scripts/test.py -opt <yml>.

Runs model.validation over the option file's test datasets with registry
metrics (reference basicsr/test.py:14-55)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from tpuir.train.options import parse_options
from tpuir.train.pipeline import test_pipeline


def main():
    root_path = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    opt, _ = parse_options(root_path, is_train=False)
    test_pipeline(root_path, opt)


if __name__ == "__main__":
    main()
