#!/usr/bin/env python
"""Full evaluation matrix -> results/results_summary.csv.

Same CLI surface and output schema as the reference scripts/tests.py; runs
the TPU backend (or CPU when no TPU is present). Suites skip gracefully
when weights/datasets are absent.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

from tpuir.harness import Harness


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights-dir", default=None)
    ap.add_argument("--results-dir", default=None)
    ap.add_argument("--no-save-images", action="store_true")
    ap.add_argument(
        "--suites",
        nargs="*",
        default=None,
        help="subset of: gray_nonblind gray_blind color_nonblind color_blind real defocus motion",
    )
    args = ap.parse_args()

    print(f"Using device: {jax.devices()[0].platform}")
    h = Harness(
        weights_dir=args.weights_dir,
        save_images=not args.no_save_images,
        results_dir=args.results_dir,
    )
    suite_map = {
        "gray_nonblind": h.gaussian_gray_nonblind,
        "gray_blind": h.gaussian_gray_blind,
        "color_nonblind": h.gaussian_color_nonblind,
        "color_blind": h.gaussian_color_blind,
        "real": h.real_noise,
        "defocus": h.defocus_blur,
        "motion": h.motion_blur,
    }
    if args.suites:
        for s in args.suites:
            suite_map[s]()
    else:
        h.run_all()
    h.save_results()


if __name__ == "__main__":
    main()
