#!/usr/bin/env python3
"""Generate a deterministic synthetic genome database + taxonomy + reads.

Used to produce parity fixtures: the reference centrifuge binaries (built in a
scratch dir, not part of this repo) are run on these inputs to produce golden
outputs that our TPU engine must match byte-for-byte.

Taxonomy layout: 2 domains -> 4 genera -> N species, one genome ("strain")
per species, so multi-candidate reads exercise the LCA tree-traversal path
(reference: classifier.h:399-515).
"""
import random
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "."
N_SPECIES = 24
GENOME_LEN = 40000
N_READS = 3000
READ_LEN = 100
SEED = 1234

rng = random.Random(SEED)
BASES = "ACGT"


def rc(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


def main():
    # --- taxonomy tree ---
    # 1 = root; domains 10,11; genera 100..103; species 1000+i; strains(leaf uid) map to species
    nodes = [(1, 1, "no rank"), (10, 1, "superkingdom"), (11, 1, "superkingdom")]
    names = {1: "root", 10: "DomainA", 11: "DomainB"}
    genera = [100, 101, 102, 103]
    for gi, g in enumerate(genera):
        dom = 10 if gi < 2 else 11
        nodes.append((g, dom, "genus"))
        names[g] = f"Genus{gi}"
    species = []
    for i in range(N_SPECIES):
        tid = 1000 + i
        g = genera[i % len(genera)]
        nodes.append((tid, g, "species"))
        names[tid] = f"Species{i}"
        species.append(tid)

    with open(f"{OUT}/nodes.dmp", "w") as f:
        for tid, parent, rank in nodes:
            f.write(f"{tid}\t|\t{parent}\t|\t{rank}\t|\n")
    with open(f"{OUT}/names.dmp", "w") as f:
        for tid, name in sorted(names.items()):
            f.write(f"{tid}\t|\t{name}\t|\t\t|\tscientific name\t|\n")

    # --- genomes ---
    # Related species within a genus share a common "core" segment so reads can
    # hit multiple genomes (multi-assignment / LCA cases).
    core = {g: "".join(rng.choice(BASES) for _ in range(GENOME_LEN // 4)) for g in genera}
    genomes = {}
    conv = []
    for i, tid in enumerate(species):
        g = genera[i % len(genera)]
        uniq = "".join(rng.choice(BASES) for _ in range(GENOME_LEN - len(core[g])))
        seq = uniq[: GENOME_LEN // 2] + core[g] + uniq[GENOME_LEN // 2 :]
        uid = f"seq{i}"
        genomes[uid] = seq
        conv.append((uid, tid))
    with open(f"{OUT}/db.fa", "w") as f:
        for uid, seq in genomes.items():
            f.write(f">{uid} synthetic genome\n")
            for j in range(0, len(seq), 70):
                f.write(seq[j : j + 70] + "\n")
    with open(f"{OUT}/conv.dmp", "w") as f:
        for uid, tid in conv:
            f.write(f"{uid}\t{tid}\n")

    # --- reads ---
    uids = list(genomes.keys())
    reads = []
    for r in range(N_READS):
        kind = rng.random()
        L = rng.choice([60, 80, 100, 100, 100, 150])
        if kind < 0.75:
            # genuine read, few mismatches
            uid = rng.choice(uids)
            pos = rng.randrange(0, len(genomes[uid]) - L)
            s = list(genomes[uid][pos : pos + L])
            for _ in range(rng.choice([0, 0, 0, 1, 1, 2, 3])):
                p = rng.randrange(L)
                s[p] = rng.choice(BASES)
            if rng.random() < 0.1:  # sprinkle Ns
                for _ in range(rng.randrange(1, 4)):
                    s[rng.randrange(L)] = "N"
            seq = "".join(s)
            if rng.random() < 0.5:
                seq = rc(seq)
            reads.append((f"{uid}_{r}", seq))
        elif kind < 0.9:
            # chimeric: half from one genome, half from another
            u1, u2 = rng.sample(uids, 2)
            h = L // 2
            p1 = rng.randrange(0, len(genomes[u1]) - h)
            p2 = rng.randrange(0, len(genomes[u2]) - (L - h))
            reads.append((f"chim_{r}", genomes[u1][p1 : p1 + h] + genomes[u2][p2 : p2 + L - h]))
        else:
            # random junk (unclassified)
            reads.append((f"junk_{r}", "".join(rng.choice(BASES) for _ in range(L))))
    with open(f"{OUT}/reads.fa", "w") as f:
        for name, seq in reads:
            f.write(f">{name}\n{seq}\n")
    with open(f"{OUT}/reads.fq", "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")

    # --- paired-end reads: fragments of 250-400bp, 100bp mates ---
    prng = random.Random(SEED + 1)
    with open(f"{OUT}/reads_1.fq", "w") as f1, open(f"{OUT}/reads_2.fq", "w") as f2:
        for r in range(N_READS // 3):
            uid = prng.choice(uids)
            flen = prng.randrange(250, 400)
            pos = prng.randrange(0, len(genomes[uid]) - flen)
            frag = genomes[uid][pos : pos + flen]
            m1 = list(frag[:READ_LEN])
            m2 = list(rc(frag[-READ_LEN:]))
            for m in (m1, m2):
                for _ in range(prng.choice([0, 0, 1, 2])):
                    m[prng.randrange(READ_LEN)] = prng.choice(BASES)
            f1.write(f"@{uid}_p{r}/1\n{''.join(m1)}\n+\n{'I' * READ_LEN}\n")
            f2.write(f"@{uid}_p{r}/2\n{''.join(m2)}\n+\n{'I' * READ_LEN}\n")
    print(f"wrote {len(genomes)} genomes, {len(reads)} reads to {OUT}")


if __name__ == "__main__":
    main()
