"""Compacted-output flow, the reference's simple_example_reduce.cpp
(reference: PFAC/test/simple_example_reduce.cpp:98-112): space-driven
table + matchFromHostReduce -> (position, pattern ID) pairs.

Run:  python examples/simple_example_reduce.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pfac_tpu.runtime import capi
from pfac_tpu.runtime.handle import PerfMode
from pfac_tpu.status import PfacStatus

HERE = os.path.dirname(__file__)
PATTERN_FILE = os.path.join(HERE, "..", "tests", "pattern", "example_pattern")
INPUT_FILE = os.path.join(HERE, "..", "tests", "data", "example_input")


def main() -> int:
    handle = [None]
    assert capi.PFAC_create(handle) == PfacStatus.SUCCESS
    h = handle[0]
    assert capi.PFAC_setPerfMode(h, PerfMode.HASH) == PfacStatus.SUCCESS

    status = capi.PFAC_readPatternFromFile(h, PATTERN_FILE)
    if status != PfacStatus.SUCCESS:
        print(f"Error: {capi.PFAC_getErrorString(status)}")
        return 1

    with open(INPUT_FILE, "rb") as f:
        data = f.read()

    import numpy as np
    h_matched = np.zeros(len(data), dtype=np.int32)
    h_pos = np.zeros(len(data), dtype=np.int32)
    h_num = []
    status = capi.PFAC_matchFromHostReduce(
        h, data, len(data), h_matched, h_pos, h_num)
    if status != PfacStatus.SUCCESS:
        print(f"Error: {capi.PFAC_getErrorString(status)}")
        return 1

    n = h_num[0]
    print(f"num_matched = {n}")
    for i in range(n):
        print(f"At position {h_pos[i]:4d}, match pattern {h_matched[i]}")

    capi.PFAC_destroy(h)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
