"""Prefilter stages.

Three modes, mirroring the reference's PREFMODE switch
(reference: src/workflow/StructureSearch.cpp:114-127, data/structuresearch.sh:41-53):

* EXHAUSTIVE — every query is paired with every target ("fake_pref",
  data/structuresearch.sh:27-38). The candidate list is the target key order.
* UNGAPPED — gapless diagonal scoring of every query against every target,
  top max_seqs kept (reference: lib/mmseqs/src/prefiltering/ungappedprefilter.cpp;
  on GPU via libmarv — here the TPU kernel in ops/gapless.py).
* KMER — the classic k-mer double-diagonal prefilter (host side, bit-parity
  with the reference; search/kmer.py).
* UNGAPPED_AND_GAPPED (mode 3) — alignment-format results straight from the
  gapped prefilter pass (search/ungapped.py).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..db.storage import StructDB
from .params import PREF_MODE_EXHAUSTIVE, PREF_MODE_KMER, PREF_MODE_UNGAPPED, SearchParams


def exhaustive_prefilter(qdb: StructDB, tdb: StructDB) -> Dict[int, List[int]]:
    tkeys = [int(k) for k in tdb.keys]
    return {int(qk): tkeys for qk in qdb.keys}


def run_prefilter(qdb: StructDB, tdb: StructDB, params: SearchParams) -> Dict[int, List[int]]:
    mode = params.prefilter_mode
    if params.exhaustive_search:
        mode = PREF_MODE_EXHAUSTIVE
    if params.index_server:
        from ..server import server_prefilter
        return server_prefilter(qdb, params.index_server, params.max_seqs)
    if mode == PREF_MODE_EXHAUSTIVE:
        return exhaustive_prefilter(qdb, tdb)
    if mode == PREF_MODE_UNGAPPED:
        from .ungapped import ungapped_prefilter
        return ungapped_prefilter(qdb, tdb, params)
    # KMER prefilter
    from .kmer import kmer_prefilter
    return kmer_prefilter(qdb, tdb, params, k=params.kmer_size)
