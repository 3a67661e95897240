"""Taxonomy model: ranks, tree, and the fixed-10-slot path table.

Mirrors the semantics of the reference's taxonomy.h (rank enum
taxonomy.h:15-47, TaxonomyNode taxonomy.h:51-60, TaxonomyPathTable
taxonomy.h:62-161, rank ordering taxonomy.h:165-205) without sharing any
code: here the tree is plain dicts and the path table is a dict of tuples.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

# Rank enum (order matters: serialized rank ids in .3.cf use these values).
RANK_UNKNOWN = 0
RANK_STRAIN = 1
RANK_SPECIES = 2
RANK_GENUS = 3
RANK_FAMILY = 4
RANK_ORDER = 5
RANK_CLASS = 6
RANK_PHYLUM = 7
RANK_KINGDOM = 8
RANK_DOMAIN = 9
RANK_FORMA = 10
RANK_INFRA_CLASS = 11
RANK_INFRA_ORDER = 12
RANK_PARV_ORDER = 13
RANK_SUB_CLASS = 14
RANK_SUB_FAMILY = 15
RANK_SUB_GENUS = 16
RANK_SUB_KINGDOM = 17
RANK_SUB_ORDER = 18
RANK_SUB_PHYLUM = 19
RANK_SUB_SPECIES = 20
RANK_SUB_TRIBE = 21
RANK_SUPER_CLASS = 22
RANK_SUPER_FAMILY = 23
RANK_SUPER_KINGDOM = 24
RANK_SUPER_ORDER = 25
RANK_SUPER_PHYLUM = 26
RANK_TRIBE = 27
RANK_VARIETAS = 28
RANK_LIFE = 29
RANK_MAX = 30

_RANK_STRINGS = {
    RANK_STRAIN: "strain",
    RANK_SPECIES: "species",
    RANK_GENUS: "genus",
    RANK_FAMILY: "family",
    RANK_ORDER: "order",
    RANK_CLASS: "class",
    RANK_PHYLUM: "phylum",
    RANK_KINGDOM: "kingdom",
    RANK_FORMA: "forma",
    RANK_INFRA_CLASS: "infraclass",
    RANK_INFRA_ORDER: "infraorder",
    RANK_PARV_ORDER: "parvorder",
    RANK_SUB_CLASS: "subclass",
    RANK_SUB_FAMILY: "subfamily",
    RANK_SUB_GENUS: "subgenus",
    RANK_SUB_KINGDOM: "subkingdom",
    RANK_SUB_ORDER: "suborder",
    RANK_SUB_PHYLUM: "subphylum",
    RANK_SUB_SPECIES: "subspecies",
    RANK_SUB_TRIBE: "subtribe",
    RANK_SUPER_CLASS: "superclass",
    RANK_SUPER_FAMILY: "superfamily",
    RANK_SUPER_KINGDOM: "superkingdom",
    RANK_SUPER_ORDER: "superorder",
    RANK_SUPER_PHYLUM: "superphylum",
    RANK_TRIBE: "tribe",
    RANK_VARIETAS: "varietas",
    RANK_LIFE: "life",
}

_RANK_IDS = {v: k for k, v in _RANK_STRINGS.items()}


def rank_string(rank: int) -> str:
    """Rank id -> display string ("no rank" for unknown ids)."""
    return _RANK_STRINGS.get(rank, "no rank")


def rank_id(s: str) -> int:
    """Rank string -> id (RANK_UNKNOWN when unrecognized)."""
    return _RANK_IDS.get(s, RANK_UNKNOWN)


# Comparable "height" of each rank in the tree; mirrors the ordering
# established by the reference's initial_tax_rank_num (taxonomy.h:165-205).
TAX_RANK_NUM = [0] * RANK_MAX


def _init_tax_rank_num() -> None:
    r = 0
    TAX_RANK_NUM[RANK_SUB_SPECIES] = r
    TAX_RANK_NUM[RANK_STRAIN] = r
    r += 1
    TAX_RANK_NUM[RANK_SPECIES] = r
    r += 1
    TAX_RANK_NUM[RANK_SUB_GENUS] = r
    TAX_RANK_NUM[RANK_GENUS] = r
    r += 1
    TAX_RANK_NUM[RANK_SUB_FAMILY] = r
    TAX_RANK_NUM[RANK_FAMILY] = r
    TAX_RANK_NUM[RANK_SUPER_FAMILY] = r
    r += 1
    TAX_RANK_NUM[RANK_SUB_ORDER] = r
    TAX_RANK_NUM[RANK_INFRA_ORDER] = r
    TAX_RANK_NUM[RANK_PARV_ORDER] = r
    TAX_RANK_NUM[RANK_ORDER] = r
    TAX_RANK_NUM[RANK_SUPER_ORDER] = r
    r += 1
    TAX_RANK_NUM[RANK_INFRA_CLASS] = r
    TAX_RANK_NUM[RANK_SUB_CLASS] = r
    TAX_RANK_NUM[RANK_CLASS] = r
    TAX_RANK_NUM[RANK_SUPER_CLASS] = r
    r += 1
    TAX_RANK_NUM[RANK_SUB_PHYLUM] = r
    TAX_RANK_NUM[RANK_PHYLUM] = r
    TAX_RANK_NUM[RANK_SUPER_PHYLUM] = r
    r += 1
    TAX_RANK_NUM[RANK_SUB_KINGDOM] = r
    TAX_RANK_NUM[RANK_KINGDOM] = r
    TAX_RANK_NUM[RANK_SUPER_KINGDOM] = r
    r += 1
    TAX_RANK_NUM[RANK_DOMAIN] = r
    TAX_RANK_NUM[RANK_FORMA] = r
    TAX_RANK_NUM[RANK_SUB_TRIBE] = r
    TAX_RANK_NUM[RANK_TRIBE] = r
    TAX_RANK_NUM[RANK_VARIETAS] = r
    TAX_RANK_NUM[RANK_UNKNOWN] = r


_init_tax_rank_num()

# Fixed path slots (strain..domain), cf. TaxonomyPathTable::rank_to_pathID
# (taxonomy.h:68-94).
N_PATH_RANKS = 10
_RANK_TO_PATH = {
    RANK_STRAIN: 0,
    RANK_SUB_SPECIES: 0,
    RANK_SPECIES: 1,
    RANK_GENUS: 2,
    RANK_FAMILY: 3,
    RANK_ORDER: 4,
    RANK_CLASS: 5,
    RANK_PHYLUM: 6,
    RANK_KINGDOM: 7,
    RANK_SUPER_KINGDOM: 8,
    RANK_DOMAIN: 9,
}
PATH_RANK_INVALID = 255


def rank_to_path_slot(rank: int) -> int:
    return _RANK_TO_PATH.get(rank, PATH_RANK_INVALID)


@dataclass
class TaxonomyNode:
    parent: int
    rank: int
    leaf: bool


@dataclass
class Taxonomy:
    """The taxonomy payload of an index: tree + names + sizes + paths."""

    tree: Dict[int, TaxonomyNode] = field(default_factory=dict)
    names: Dict[int, str] = field(default_factory=dict)
    sizes: Dict[int, int] = field(default_factory=dict)
    # tid -> 10-slot path [strain, species, ..., domain], 0 = absent
    paths: Dict[int, Tuple[int, ...]] = field(default_factory=dict)

    def build_paths(self, uid_tids: List[int]) -> None:
        """Build the per-leaf-taxon fixed path table.

        Walks each classified taxon up to the root, recording the taxon id
        occupying each canonical rank slot; an unranked *first* node counts
        as strain. Mirrors TaxonomyPathTable::buildPaths (taxonomy.h:96-149).
        """
        self.paths.clear()
        for tid0 in uid_tids:
            if tid0 in self.paths or tid0 not in self.tree:
                continue
            path = [0] * N_PATH_RANKS
            tid = tid0
            first = True
            while True:
                node = self.tree.get(tid)
                if node is None:
                    break
                if first and node.rank == RANK_UNKNOWN:
                    slot = 0
                else:
                    slot = rank_to_path_slot(node.rank)
                if slot < N_PATH_RANKS and path[slot] == 0:
                    path[slot] = tid
                first = False
                if node.parent == tid:
                    break
                tid = node.parent
            self.paths[tid0] = tuple(path)

    def get_path(self, tid: int) -> Tuple[int, ...]:
        return self.paths.get(tid, ())

    def propagate_average_sizes(self) -> None:
        """Average leaf genome sizes up to species..phylum ancestors.

        For every size entry at (unranked leaf | below-species) rank, add its
        size to each canonical-rank ancestor, then replace each ancestor's
        size with the integer mean. Mirrors the loader logic in the
        reference's Ebwt ctor (bt2_idx.h:709-744).
        """
        tid_count: Dict[int, int] = {}
        new_size: Dict[int, int] = {}
        canonical = (RANK_SPECIES, RANK_GENUS, RANK_FAMILY, RANK_ORDER,
                     RANK_CLASS, RANK_PHYLUM)
        for c_tid in self.sizes:
            node = self.tree.get(c_tid)
            if node is None or node.parent == c_tid:
                continue
            add_size = self.sizes[c_tid]
            below_species = ((node.rank == RANK_UNKNOWN and node.leaf)
                             or TAX_RANK_NUM[node.rank] < TAX_RANK_NUM[RANK_SPECIES])
            if not below_species or node.parent == c_tid:
                continue
            tid = node.parent
            while True:
                n2 = self.tree.get(tid)
                if n2 is None:
                    break
                if n2.rank in canonical:
                    new_size[tid] = new_size.get(tid, 0) + add_size
                    tid_count[tid] = tid_count.get(tid, 0) + 1
                if tid == n2.parent:
                    break
                tid = n2.parent
        for tid, cnt in tid_count.items():
            self.sizes[tid] = new_size[tid] // cnt

    def ancestor_closure(self, taxids: List[int]) -> set:
        """All taxids on paths from the given ids up to the root."""
        out = set()
        for tid in taxids:
            while tid not in out:
                out.add(tid)
                node = self.tree.get(tid)
                if node is None or node.parent == tid:
                    break
                tid = node.parent
        return out

    def descendant_closure(self, targets: List[int]) -> set:
        """Taxids whose root-path passes through any of the targets.

        Used for --host-taxids / --exclude-taxids expansion; mirrors the
        constructor loops in classifier.h:157-201.
        """
        targets_set = set(targets)
        out = set()
        for tid0 in self.tree:
            tid = tid0
            while True:
                if tid in targets_set:
                    out.add(tid0)
                    break
                node = self.tree.get(tid)
                if node is None or tid == node.parent:
                    break
                tid = node.parent
        return out


def parse_nodes_dmp(path: str) -> Dict[int, TaxonomyNode]:
    """Parse an NCBI-style nodes.dmp (tid |parent| rank). taxonomy.h:322-348."""
    tree: Dict[int, TaxonomyNode] = {}
    with open(path) as f:
        for line in f:
            if not line.strip() or line.startswith("#"):
                continue
            parts = [p.strip() for p in line.split("|")]
            fields = parts[0].split() + parts[1].split() + [parts[2].split()[0] if parts[2].split() else ""]
            tid = int(fields[0])
            parent = int(fields[1])
            rank = rank_id(fields[2]) if len(fields) > 2 else RANK_UNKNOWN
            if tid in tree:
                continue
            tree[tid] = TaxonomyNode(parent, rank, False)
    return tree


def parse_names_dmp(path: str) -> Dict[int, str]:
    """Parse names.dmp keeping only scientific names."""
    names: Dict[int, str] = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            parts = [p.strip() for p in line.split("|")]
            if len(parts) < 4:
                continue
            if "scientific name" not in parts[3]:
                continue
            names[int(parts[0])] = parts[1]
    return names
