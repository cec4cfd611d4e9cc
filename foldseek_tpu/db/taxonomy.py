"""NCBI taxonomy support — per-entry taxid mappings and the taxonomy output
columns (reference: lib/mmseqs/src/taxonomy/NcbiTaxonomy.cpp, surfaced in
foldseek through createdb --tax-mapping-file and convertalis taxid/taxname/
taxlineage columns).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

from ..utils.log import logger


class NcbiTaxonomy:
    """Minimal NCBI taxdump reader: nodes.dmp (id -> parent, rank) and
    names.dmp (scientific names); provides names, lineages, and LCA."""

    def __init__(self, taxdump_dir: str):
        self.parent: Dict[int, int] = {}
        self.rank: Dict[int, str] = {}
        self.name: Dict[int, str] = {}
        with open(os.path.join(taxdump_dir, "nodes.dmp")) as f:
            for line in f:
                parts = [p.strip() for p in line.split("|")]
                tid, parent, rank = int(parts[0]), int(parts[1]), parts[2]
                self.parent[tid] = parent
                self.rank[tid] = rank
        with open(os.path.join(taxdump_dir, "names.dmp")) as f:
            for line in f:
                parts = [p.strip() for p in line.split("|")]
                if len(parts) > 3 and parts[3] == "scientific name":
                    self.name[int(parts[0])] = parts[1]
        logger.info("taxonomy: %d nodes, %d names", len(self.parent), len(self.name))

    def lineage(self, taxid: int) -> List[int]:
        out = []
        seen = set()
        while taxid in self.parent and taxid not in seen and taxid != 1:
            out.append(taxid)
            seen.add(taxid)
            taxid = self.parent[taxid]
        out.append(1)
        return out[::-1]

    def lineage_str(self, taxid: int) -> str:
        parts = []
        for t in self.lineage(taxid):
            r = self.rank.get(t, "no rank")
            prefix = {"superkingdom": "d_", "kingdom": "k_", "phylum": "p_",
                      "class": "c_", "order": "o_", "family": "f_",
                      "genus": "g_", "species": "s_"}.get(r)
            if prefix:
                parts.append(prefix + self.name.get(t, str(t)))
        return ";".join(parts)

    def lca(self, taxids: List[int]) -> int:
        """Lowest common ancestor of a set of taxa."""
        taxids = [t for t in taxids if t in self.parent]
        if not taxids:
            return 0
        common = None
        for t in taxids:
            lin = set(self.lineage(t))
            common = lin if common is None else (common & lin)
        if not common:
            return 1
        # deepest node among the common ancestors
        best = max(common, key=lambda t: len(self.lineage(t)))
        return best


def load_tax_mapping(path: str) -> Dict[str, int]:
    """Entry-name (or accession) -> taxid TSV (the reference's _mapping)."""
    out = {}
    for line in open(path):
        parts = line.rstrip("\n").split("\t")
        if len(parts) >= 2:
            try:
                out[parts[0]] = int(parts[1])
            except ValueError:
                continue
    return out


def db_taxids(db, mapping: Dict[str, int]) -> Dict[int, int]:
    """Per-entry taxid by matching entry name, its complex prefix, or the
    source file name against the mapping."""
    out = {}
    for i in range(db.size):
        name = db.names[i]
        tid = mapping.get(name)
        if tid is None and "_" in name:
            tid = mapping.get(name[:name.rfind("_")])
        if tid is None and db.sources is not None and db.fileids is not None:
            fid = int(db.fileids[i])
            if fid < len(db.sources):
                tid = mapping.get(db.sources[fid])
        out[int(db.keys[i])] = tid if tid is not None else 0
    return out


def save_db_mapping(db, mapping: Dict[str, int]):
    taxids = db_taxids(db, mapping)
    with open(os.path.join(db.path, "mapping.tsv"), "w") as f:
        for i in range(db.size):
            key = int(db.keys[i])
            f.write(f"{key}\t{taxids[key]}\n")


def load_db_mapping(db_path: str) -> Optional[Dict[int, int]]:
    path = os.path.join(db_path, "mapping.tsv")
    if not os.path.isfile(path):
        return None
    out = {}
    for line in open(path):
        k, t = line.split("\t")
        out[int(k)] = int(t)
    return out
