"""Read simulation for accuracy evaluation.

Mirrors evaluation/centrifuge_simulate_reads.py:585-782: sample fragments
from the database genomes (optionally with an expression profile),
inject sequencing errors with a deterministic RNG, name each read with
its ground truth, and emit a .truth/.scm table mapping read IDs to
source sequence + taxon.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

BASES = "ACGT"


@dataclass
class SimConfig:
    num_fragments: int = 10000
    read_length: int = 100
    paired: bool = False
    frag_len_min: int = 250
    frag_len_max: int = 400
    error_rate: float = 0.0      # per-base substitution probability
    expr_profile: str = "uniform"  # uniform | dna (90/10 skew)
    seed: int = 0


def _load_fasta(path: str) -> List[Tuple[str, str]]:
    seqs: List[Tuple[str, str]] = []
    name = None
    chunks: List[str] = []
    with open(path) as f:
        for line in f:
            if line.startswith(">"):
                if name is not None:
                    seqs.append((name, "".join(chunks)))
                name = line[1:].strip()
                chunks = []
            else:
                chunks.append(line.strip())
    if name is not None:
        seqs.append((name, "".join(chunks)))
    return seqs


def _rc(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp.get(c, "N") for c in reversed(s))


def simulate(fasta: str, conversion_table: str, out_prefix: str,
             cfg: SimConfig) -> None:
    """Write <out_prefix>.fq (or _1.fq/_2.fq) and <out_prefix>.truth."""
    rng = random.Random(cfg.seed)
    seqs = _load_fasta(fasta)
    uid_to_tid: Dict[str, str] = {}
    with open(conversion_table) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                uid_to_tid[parts[0]] = parts[1]

    # expression profile: how many fragments each genome contributes
    n = len(seqs)
    if cfg.expr_profile == "dna":
        # 10% of genomes get 90% of reads (centrifuge_simulate_reads.py
        # DNA profile spirit)
        hot = max(1, n // 10)
        weights = [9.0 * n / hot if i < hot else 1.0 for i in range(n)]
    else:
        weights = [1.0] * n
    total_w = sum(weights)
    counts = [int(round(cfg.num_fragments * w / total_w)) for w in weights]

    def mutate(s: str) -> str:
        if cfg.error_rate <= 0:
            return s
        out = list(s)
        for i in range(len(out)):
            if rng.random() < cfg.error_rate:
                out[i] = rng.choice([b for b in BASES if b != out[i]])
        return "".join(out)

    truth_rows: List[str] = []
    if cfg.paired:
        f1 = open(out_prefix + "_1.fq", "w")
        f2 = open(out_prefix + "_2.fq", "w")
    else:
        f1 = open(out_prefix + ".fq", "w")
        f2 = None
    try:
        rid = 0
        for (header, seq), cnt in zip(seqs, counts):
            uid = header.split()[0]
            tid = uid_to_tid.get(uid, "0")
            L = cfg.read_length
            for _ in range(cnt):
                if cfg.paired:
                    flen = rng.randint(cfg.frag_len_min,
                                       min(cfg.frag_len_max, len(seq)))
                    if len(seq) <= flen:
                        continue
                    pos = rng.randrange(0, len(seq) - flen)
                    frag = seq[pos: pos + flen]
                    m1 = mutate(frag[:L])
                    m2 = mutate(_rc(frag[-L:]))
                    name = f"{uid}|{tid}|{pos}_{rid}"
                    f1.write(f"@{name}/1\n{m1}\n+\n{'I' * len(m1)}\n")
                    f2.write(f"@{name}/2\n{m2}\n+\n{'I' * len(m2)}\n")
                else:
                    if len(seq) <= L:
                        continue
                    pos = rng.randrange(0, len(seq) - L)
                    read = mutate(seq[pos: pos + L])
                    if rng.random() < 0.5:
                        read = _rc(read)
                    name = f"{uid}|{tid}|{pos}_{rid}"
                    f1.write(f"@{name}\n{read}\n+\n{'I' * len(read)}\n")
                truth_rows.append(f"{uid}|{tid}|{rid}\t{uid}\t{tid}")
                rid += 1
    finally:
        f1.close()
        if f2 is not None:
            f2.close()
    with open(out_prefix + ".truth", "w") as tf:
        tf.write("readID\tuid\ttaxID\n")
        tf.write("\n".join(truth_rows) + "\n")
