"""Byte-compare matching blobs of two `.sbs` files
(maps io/blob_compare.cc).

    python -m gemma_tpu.tools.blob_compare a.sbs b.sbs
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from gemma_tpu.io.blob_store import BlobReader


def compare(path_a: str, path_b: str, verbose: bool = True) -> int:
    a = BlobReader(path_a)
    b = BlobReader(path_b)
    keys_a, keys_b = set(a.keys), set(b.keys)
    mismatches = 0
    for key in sorted(keys_a - keys_b):
        print(f"only in {path_a}: {key}")
        mismatches += 1
    for key in sorted(keys_b - keys_a):
        print(f"only in {path_b}: {key}")
        mismatches += 1
    for key in sorted(keys_a & keys_b):
        da = a.read(key, copy=False)
        db = b.read(key, copy=False)
        if da.shape != db.shape:
            print(f"{key}: size {da.shape} vs {db.shape}")
            mismatches += 1
        elif not np.array_equal(da, db):
            diff = int(np.count_nonzero(da != db))
            print(f"{key}: {diff}/{da.size} bytes differ")
            mismatches += 1
        elif verbose:
            print(f"{key}: identical ({da.size} bytes)")
    return mismatches


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("file_a")
    p.add_argument("file_b")
    p.add_argument("-q", "--quiet", action="store_true")
    ns = p.parse_args(argv)
    mismatches = compare(ns.file_a, ns.file_b, verbose=not ns.quiet)
    print(f"{mismatches} mismatches")
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
