#!/usr/bin/env python
"""Fetch released checkpoints and evaluation datasets.

Manifest-driven replacement for the reference's download_weights.sh /
download_datasets.sh (same sources: KAIR/Restormer GitHub releases, the
MaIR/DeblurGANv2 Google Drive files, the original REDNet caffemodel).
REDNet needs no conversion step here — the framework reads .caffemodel
directly (tpuir/weights/caffe.py).

Usage:
  python scripts/download.py weights [--only restormer mair ...]
  python scripts/download.py datasets [--only gaussian sidd dpdd gopro hide realblur_j realblur_r]
"""

import argparse
import hashlib
import os
import subprocess
import sys
import zipfile

GDRIVE = "https://drive.usercontent.google.com/download?id={id}&export=download&confirm=t"

# Integrity pins, keyed by destination path. Fill in as artifacts are first
# fetched on a trusted connection (`sha256sum <file>`); entries left absent
# are still guarded against silent GDrive quota/HTML error pages below.
CHECKSUMS: dict = {}

WEIGHTS = {
    "rednet": [
        (
            "https://bitbucket.org/chhshen/image-denoising/raw/master/model/denoising/50.caffemodel",
            "weights/REDNet/50.caffemodel",
        ),
    ],
    "dncnn": [
        (f"https://github.com/cszn/KAIR/releases/download/v1.0/dncnn_{n}.pth",
         f"weights/DnCNN/dncnn_{n}.pth")
        for n in (15, 25, 50)
    ] + [
        ("https://github.com/cszn/KAIR/releases/download/v1.0/dncnn_gray_blind.pth",
         "weights/DnCNN/dncnn_gray_blind.pth"),
        ("https://github.com/cszn/KAIR/releases/download/v1.0/dncnn_color_blind.pth",
         "weights/DnCNN/dncnn_color_blind.pth"),
    ],
    "deblurganv2": [
        (GDRIVE.format(id="1UXcsRVW-6KF23_TNzxw-xC0SzaMfXOaR"),
         "weights/DeblurGANv2/fpn_inception.h5"),
        (GDRIVE.format(id="1JhnT4BBeKBBSLqTo6UsJ13HeBXevarrU"),
         "weights/DeblurGANv2/fpn_mobilenet.h5"),
    ],
    "restormer": [
        (f"https://github.com/swz30/Restormer/releases/download/v1.0/{f}",
         f"weights/Restormer/{d}/{f}")
        for d, f in
        [("denoising", "gaussian_color_denoising_blind.pth"),
         ("denoising", "gaussian_gray_denoising_blind.pth")]
        + [("denoising", f"gaussian_color_denoising_sigma{n}.pth") for n in (15, 25, 50)]
        + [("denoising", f"gaussian_gray_denoising_sigma{n}.pth") for n in (15, 25, 50)]
        + [("denoising", "real_denoising.pth"),
           ("deblurring", "motion_deblurring.pth"),
           ("deblurring", "single_image_defocus_deblurring.pth"),
           ("deblurring", "dual_pixel_defocus_deblurring.pth")]
    ],
    "mair": [
        (GDRIVE.format(id="1XUDCSK1Cs492mopqQrDVLNCC2stO1paA"),
         "weights/MaIR/denoising/MaIR_CDN_s15.pth"),
        (GDRIVE.format(id="1jIDSzksBracVnyiVSkwFNEX--JOP1H1i"),
         "weights/MaIR/denoising/MaIR_CDN_s25.pth"),
        (GDRIVE.format(id="1YdhrrPfEZ70JVuJgFdTmSLtFuu2giFdb"),
         "weights/MaIR/denoising/MaIR_CDN_s50.pth"),
        (GDRIVE.format(id="1M8pDYp_-Yl46pMFqv_tnImJ8w1z6h7bH"),
         "weights/MaIR/denoising/MaIR_RealDN.pth"),
        (GDRIVE.format(id="1bdYWJ0FXYknQuJQg77KrwII2jJHlX-3k"),
         "weights/MaIR/deblurring/MaIR_MotionDeblur.pth"),
    ],
}

# dataset zips extract into datasets/<task>/<subtask>/test/...
DATASETS = {
    "gaussian": (GDRIVE.format(id="1mwMLt-niNqcQpfN_ZduG9j4k6P_ZkOl0"),
                 "datasets/denoising/gaussian"),
    "sidd": (GDRIVE.format(id="11vfqV-lqousZTuAit1Qkqghiv_taY0KZ"),
             "datasets/denoising/real"),
    "dpdd": (GDRIVE.format(id="1dDWUQ_D93XGtcywoUcZE1HOXCV4EuLyw"),
             "datasets/deblurring/defocus"),
    "gopro": (GDRIVE.format(id="1k6DTSHu4saUgrGTYkkZXTptILyG9RRll"),
              "datasets/deblurring/motion"),
    "hide": (GDRIVE.format(id="1XRomKYJF1H92g1EuD06pCQe4o6HlwB7A"),
             "datasets/deblurring/motion"),
    "realblur_j": (GDRIVE.format(id="1glgeWXCy7Y0qWDc0MXBTUlZYJf8984hS"),
                   "datasets/deblurring/motion"),
    "realblur_r": (GDRIVE.format(id="1Rb1DhhXmX7IXfilQ-zL9aGjQfAAvQTrW"),
                   "datasets/deblurring/motion"),
}


def _verify(dest: str):
    """Integrity gate: sha256 pin when known, plus an HTML-error-page sniff
    (GDrive quota errors download as text/html with a 200)."""
    with open(dest, "rb") as f:
        head = f.read(512)
    if head.lstrip()[:15].lower().startswith((b"<!doctype html", b"<html")):
        os.remove(dest)
        raise RuntimeError(f"{dest}: server returned an HTML page, not the file")
    want = CHECKSUMS.get(dest)
    if want is not None:
        h = hashlib.sha256()
        with open(dest, "rb") as f:
            for blk in iter(lambda: f.read(1 << 20), b""):
                h.update(blk)
        if h.hexdigest() != want:
            os.remove(dest)
            raise RuntimeError(f"{dest}: sha256 mismatch (got {h.hexdigest()})")


def fetch(url: str, dest: str):
    if os.path.exists(dest):
        print(f"[skip] {dest} exists")
        return
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    print(f"[get ] {dest}")
    subprocess.check_call(["wget", "-q", "--show-progress", url, "-O", dest])
    _verify(dest)


def fetch_zip(url: str, extract_to: str):
    os.makedirs(extract_to, exist_ok=True)
    tmp = os.path.join(extract_to, "_download.zip")
    subprocess.check_call(["wget", "-q", "--show-progress", url, "-O", tmp])
    _verify(tmp)
    with zipfile.ZipFile(tmp) as zf:
        zf.extractall(extract_to)
    os.remove(tmp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["weights", "datasets"])
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    if args.what == "weights":
        for family, items in WEIGHTS.items():
            if args.only and family not in args.only:
                continue
            for url, dest in items:
                fetch(url, dest)
    else:
        for name, (url, dest) in DATASETS.items():
            if args.only and name not in args.only:
                continue
            print(f"[get ] dataset {name} -> {dest}")
            fetch_zip(url, dest)


if __name__ == "__main__":
    sys.exit(main())
