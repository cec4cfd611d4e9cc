"""Length-bucketed target panels + HBM split planning for the gapless
prefilter.

Reference analogues:
  * makepaddedseqdb sorts the DB by length and pads for the GPU kernels
    (lib/mmseqs/src/util/makepaddedseqdb.cpp); libmarv batches the DB by
    length partition (lib/mmseqs/lib/libmarv/src/dbbatching.cuh).
  * Prefiltering::setupSplit plans query/target splits from available
    memory (lib/mmseqs/src/prefiltering/Prefiltering.cpp:289-381) and
    merges per-query hit lists across target splits.

TPU-native layout: targets are grouped into buckets by padded length
(multiples of 128 sublanes); each bucket is one transposed int8 panel
[lt_pad, n_pad] that a single kernel launch scans. Memory scales with
sum(bucket sizes), not max_len * N. When the padded panels exceed a device
HBM budget, buckets are partitioned row-wise into splits; each split is
device_put, scanned for the whole query batch, reduced to a device-side
per-query top-k, and the per-split top-ks are merged on the host.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.log import logger

PAD_LETTER = 21
ROW_MULTIPLE = 128  # kernel block width divides this
LT_MULTIPLE = 128


def bucket_boundary(length: int) -> int:
    """Padded length for a target of `length`: next multiple of 128 up to
    512, then ~1.5x growth rounded up to 128 (768, 1152, 1792, 2688, ...)
    so the bucket count stays small at AFDB-like length distributions."""
    if length <= 512:
        return max(LT_MULTIPLE, -(-length // LT_MULTIPLE) * LT_MULTIPLE)
    b = 512
    while b < length:
        b += max(LT_MULTIPLE, b // 2)
        b = -(-b // LT_MULTIPLE) * LT_MULTIPLE
    return b


@dataclass
class Bucket:
    lt_pad: int
    entry_idx: np.ndarray      # [n] original DB entry indices
    panel_T: np.ndarray        # int8 [lt_pad, n_pad] transposed, PAD_LETTER pad

    @property
    def n(self) -> int:
        return len(self.entry_idx)

    @property
    def n_pad(self) -> int:
        return self.panel_T.shape[1]

    @property
    def nbytes(self) -> int:
        # panels stay int8 on device (the kernel upcasts in registers)
        return self.lt_pad * self.n_pad


def build_buckets(seqs: Sequence[np.ndarray],
                  lengths: Sequence[int]) -> List[Bucket]:
    """Group sequences into length buckets and pack transposed panels."""
    groups = {}
    for i, L in enumerate(lengths):
        groups.setdefault(bucket_boundary(int(L)), []).append(i)
    buckets = []
    for lt_pad in sorted(groups):
        idx = np.asarray(groups[lt_pad], dtype=np.int64)
        n_pad = -(-len(idx) // ROW_MULTIPLE) * ROW_MULTIPLE
        panel = np.full((n_pad, lt_pad), PAD_LETTER, dtype=np.int8)
        for row, i in enumerate(idx):
            s = seqs[i]
            L = min(len(s), lt_pad)
            panel[row, :L] = s[:L]
        buckets.append(Bucket(lt_pad=lt_pad, entry_idx=idx,
                              panel_T=np.ascontiguousarray(panel.T)))
    return buckets


@dataclass
class SplitPiece:
    bucket: int      # index into the bucket list
    row_start: int   # first panel row (multiple of ROW_MULTIPLE)
    row_end: int     # exclusive, multiple of ROW_MULTIPLE (or n_pad)


def plan_splits(buckets: Sequence[Bucket],
                budget_bytes: Optional[int]) -> List[List[SplitPiece]]:
    """Partition the panels into splits of at most budget_bytes device
    bytes each (the TARGET_DB_SPLIT analogue). A bucket larger than the
    budget is cut row-wise at ROW_MULTIPLE boundaries."""
    if budget_bytes is None:
        return [[SplitPiece(b, 0, buckets[b].n_pad)
                 for b in range(len(buckets))]]
    splits: List[List[SplitPiece]] = []
    cur: List[SplitPiece] = []
    cur_bytes = 0
    for bi, b in enumerate(buckets):
        row = 0
        row_bytes = b.lt_pad
        while row < b.n_pad:
            room = (budget_bytes - cur_bytes) // (row_bytes * ROW_MULTIPLE)
            take = min(int(room) * ROW_MULTIPLE, b.n_pad - row)
            if take <= 0:
                if cur:
                    splits.append(cur)
                    cur, cur_bytes = [], 0
                    continue
                # single block exceeds budget: take one block anyway
                take = min(ROW_MULTIPLE, b.n_pad - row)
            cur.append(SplitPiece(bi, row, row + take))
            cur_bytes += take * row_bytes
            row += take
    if cur:
        splits.append(cur)
    if len(splits) > 1:
        logger.info("prefilter split plan: %d splits over %d buckets "
                    "(budget %.1f MB)", len(splits), len(buckets),
                    budget_bytes / 1e6)
    return splits


class PanelSet:
    """Bucketed panels over a target DB, streamed through HBM in splits.

    scan(profs, caps, kernel) yields per-split device score blocks; the
    caller merges. Panels stay resident when they fit in one split."""

    def __init__(self, buckets: List[Bucket], n_entries: int,
                 budget_bytes: Optional[int] = None):
        self.buckets = buckets
        self.n_entries = n_entries
        self.splits = plan_splits(buckets, budget_bytes)
        self._resident = {}  # (bucket, row_start, row_end) -> device array

    @classmethod
    def from_db(cls, db, budget_bytes: Optional[int] = None,
                use_index: bool = True) -> "PanelSet":
        if use_index:
            from .index import load_index
            idx = load_index(db)
            if idx is not None and "buckets" in idx:
                return cls(idx["buckets"], db.size, budget_bytes)
        lens = db.lengths()
        seqs = [db.get_ss(i) for i in range(db.size)]
        return cls(build_buckets(seqs, lens), db.size, budget_bytes)

    @property
    def total_bytes(self) -> int:
        return sum(b.nbytes for b in self.buckets)

    def device_panel(self, piece: SplitPiece, keep: bool):
        import jax.numpy as jnp
        key = (piece.bucket, piece.row_start, piece.row_end)
        arr = self._resident.get(key)
        if arr is None:
            host = self.buckets[piece.bucket].panel_T[
                :, piece.row_start:piece.row_end]
            arr = jnp.asarray(np.ascontiguousarray(host))  # int8 on device
            if keep:
                self._resident[key] = arr
        return arr

    def iter_pieces(self) -> Iterator[Tuple[int, SplitPiece]]:
        for si, split in enumerate(self.splits):
            for piece in split:
                yield si, piece
