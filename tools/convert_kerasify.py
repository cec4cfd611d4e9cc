#!/usr/bin/env python3
"""Convert kerasify model files shipped with the reference into .npz weight files.

The kerasify container (reference: lib/kerasify/keras_model.cpp:632-700) is a
little-endian stream: uint32 layer count, then per layer a uint32 layer type.
We only need Dense layers (type 1): uint32 rows, cols, bias_len, float32
weights[rows*cols] (row-major, in@W), float32 bias[bias_len], uint32 activation
(1=linear, 2=relu, 3=softplus, 4=sigmoid, 5=tanh, 6=hard-sigmoid).

Usage: convert_kerasify.py <in.kerasify> <out.npz>
"""
import struct
import sys

import numpy as np

ACT_NAMES = {1: "linear", 2: "relu", 3: "softplus", 4: "sigmoid", 5: "tanh", 6: "hard_sigmoid"}


def parse_kerasify(path):
    with open(path, "rb") as f:
        data = f.read()
    off = 0

    def u32():
        nonlocal off
        (v,) = struct.unpack_from("<I", data, off)
        off += 4
        return v

    def floats(n):
        nonlocal off
        v = np.frombuffer(data, dtype="<f4", count=n, offset=off).copy()
        off += 4 * n
        return v

    n_layers = u32()
    layers = []
    for _ in range(n_layers):
        lt = u32()
        if lt != 1:
            raise NotImplementedError(f"layer type {lt} not supported")
        rows, cols, blen = u32(), u32(), u32()
        w = floats(rows * cols).reshape(rows, cols)
        b = floats(blen)
        act = u32()
        layers.append((w, b, ACT_NAMES[act]))
    assert off == len(data), f"trailing bytes: {len(data) - off}"
    return layers


def main():
    src, dst = sys.argv[1], sys.argv[2]
    layers = parse_kerasify(src)
    out = {}
    for i, (w, b, act) in enumerate(layers):
        out[f"w{i}"] = w
        out[f"b{i}"] = b
        out[f"act{i}"] = np.array(act)
    out["n_layers"] = np.array(len(layers))
    np.savez(dst, **out)
    for i, (w, b, act) in enumerate(layers):
        print(f"layer {i}: dense {w.shape} + bias {b.shape}, act={act}")


if __name__ == "__main__":
    main()
