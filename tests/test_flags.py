"""Every CLI flag must be consumed (or explicitly rejected) somewhere.

VERDICT r1 weak #5: flags that parse but change nothing are worse than
absent flags.  This meta-test greps the package for each parsed dest.
"""
import glob
import os
import re

from leaf_tpu.train.params import parse_args

PKG = os.path.join(os.path.dirname(__file__), "..", "leaf_tpu")


def test_no_dead_flags():
    ns = parse_args(["--model", "ViT-tiny-test"])
    src = "".join(
        open(f).read()
        for f in glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True))
    missing = []
    for dest in vars(ns):
        pat = (rf"args\.{dest}\b|getattr\(args, [\"']{dest}[\"']"
               rf"|[\"']{dest}[\"']")
        if not re.search(pat, src):
            missing.append(dest)
    assert not missing, f"flags parsed but never consumed: {missing}"
