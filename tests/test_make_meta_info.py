"""make_meta_info output must be byte-compatible with the reference's
shipped meta_info files (which we regenerate rather than redistribute)."""

import subprocess
import sys

REF = "/root/reference/src/mair/realDenoising/basicsr/data/meta_info"


def _run(*args):
    out = subprocess.run(
        [sys.executable, "scripts/make_meta_info.py", *args],
        capture_output=True, text=True, check=True,
    )
    return out.stdout


def _ref(name):
    with open(f"{REF}/{name}") as f:
        return f.read()


def test_reds_meta_matches_reference():
    assert _run("reds") == _ref("meta_info_REDS_GT.txt")


def test_reds4_meta_matches_reference():
    assert _run("reds4") == _ref("meta_info_REDS4_test_GT.txt")


def test_redsofficial4_meta_matches_reference():
    assert _run("redsofficial4") == _ref("meta_info_REDSofficial4_test_GT.txt")


def test_redsval_meta_matches_reference():
    assert _run("redsval") == _ref("meta_info_REDSval_official_test_GT.txt")


def test_vimeo_meta_from_list(tmp_path):
    lst = tmp_path / "sep_trainlist.txt"
    lst.write_text("00001/0001\n00001/0002\n\n")
    out = _run("vimeo", "--list", str(lst))
    assert out == "00001/0001 7 (256,448,3)\n00001/0002 7 (256,448,3)\n"
    # spot-check against the head of the reference train list
    ref_head = _ref("meta_info_Vimeo90K_train_GT.txt").splitlines()[:2]
    assert out.splitlines() == ref_head
