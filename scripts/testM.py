#!/usr/bin/env python
"""Checkpoint-sweep evaluation — basicsr/testM.py equivalent
(/root/reference/src/mair/basicsr/testM.py:13-55): runs the option file's
test sets against every net_g_*.npz in a directory at a step interval.

  python scripts/testM.py -opt options/test/xxx.yml \
      --models-dir experiments/NAME/models --step 4000
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from tpuir.train.options import parse_options
from tpuir.train.pipeline import create_train_val_dataloader
from tpuir.train.logging_utils import get_root_logger
from tpuir.train.model import build_model


def main():
    argv = sys.argv[1:]
    sweep = argparse.ArgumentParser(add_help=False)
    sweep.add_argument("--models-dir", required=True)
    sweep.add_argument("--step", type=int, default=1)
    sweep_args, rest = sweep.parse_known_args(argv)

    root_path = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    opt, _ = parse_options(root_path, is_train=False, args=rest)
    logger = get_root_logger()
    _, val_loaders = create_train_val_dataloader(opt, logger)

    ckpts = []
    for p in glob.glob(os.path.join(sweep_args.models_dir, "net_g_*.npz")):
        m = re.search(r"net_g_(\d+)\.npz$", p)
        if m:
            ckpts.append((int(m.group(1)), p))
    ckpts.sort()

    model = build_model(opt)
    for it, path in ckpts:
        if it % sweep_args.step:
            continue
        model.load_network(path)
        for name, loader in val_loaders:
            metrics = model.validation(loader)
            logger.info(f"iter {it} | {name}: {metrics}")


if __name__ == "__main__":
    main()
