#!/usr/bin/env python3
"""Offline converter: PULCHRA's N/C/O statistical backbone tables
(lib/pulchra/nco_data.h `nco_stat` / `nco_stat_pro`) -> npz.

Each entry is {bins: (bin13_1, bin13_2, bin14), data: 8 xyz rows} where
rows 0-3 are the 4-mer C-alpha template and rows 4-7 carry C(i-1), O(i-1),
N(i), (side datum) in the template frame (pulchra.cpp:339-462 uses rows 4
and 6). The trailing sentinel rows (bins[0] < 0) are dropped.

Usage: python tools/convert_pulchra_data.py <nco_data.h> <out.npz>
"""
import re
import sys

import numpy as np


def parse_table(text: str, name: str):
    m = re.search(rf"nco_struct\s+{name}\[\]\s*=\s*\{{(.*?)\}}\}}\}};",
                  text, re.S)
    if not m:
        raise SystemExit(f"table {name} not found")
    body = m.group(1)
    entries = re.findall(r"\{\s*\{([^}]*)\}\s*,\s*\{([^}]*)\}\s*\}", body)
    bins, data = [], []
    for b, d in entries:
        bvals = [int(x) for x in b.replace(",", " ").split()]
        dvals = [float(x) for x in d.replace(",", " ").split()]
        if bvals[0] < 0:
            continue
        assert len(bvals) == 3 and len(dvals) == 24, (bvals, len(dvals))
        bins.append(bvals)
        data.append(np.asarray(dvals, dtype=np.float64).reshape(8, 3))
    return np.asarray(bins, dtype=np.int32), np.stack(data)


def main():
    src, out = sys.argv[1], sys.argv[2]
    text = open(src).read()
    bins, data = parse_table(text, "nco_stat")
    bins_pro, data_pro = parse_table(text, "nco_stat_pro")
    np.savez_compressed(out, bins=bins, data=data,
                        bins_pro=bins_pro, data_pro=data_pro)
    print(f"{out}: nco_stat {len(bins)} entries, nco_stat_pro {len(bins_pro)}")


if __name__ == "__main__":
    main()
