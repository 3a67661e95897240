"""Multi-host (multi-process) classification on simulated CPU hosts.

Spawns 2 processes (jax.distributed + gloo CPU collectives), each with 4
virtual devices, forming one global (dp, fm) mesh. Each process
classifies its contiguous read shard (the --file-parallel analog); the
merged TSV must be byte-identical to the single-process golden -- which
is byte-identical to the reference binary. This is the harness the
reference cannot offer (it has no distributed backend; SURVEY.md §4).
"""

import os
import subprocess
import sys

import pytest

from conftest import fixture_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); n_fm = int(sys.argv[3])
out_path = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, %(repo)r)
from centrifuge_tpu.parallel import multihost
multihost.initialize("localhost:%(port)d", nproc, pid, local_devices=4)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from centrifuge_tpu.index.cf_io import load_cf_index
from centrifuge_tpu.io.fastx import read_batch
idx = load_cf_index(%(idx)r)
pipe = multihost.make_multihost_pipeline(idx, n_fm=n_fm, wide=True)
reads = read_batch([%(reads)r], limit=512)
mine = multihost.shard_reads(reads, pid, nproc)
BATCH = 128
rows = []
for chunk in pipe.classify_stream_unpaired(
        mine[i: i + BATCH] for i in range(0, len(mine), BATCH)):
    rows += chunk
with open(out_path, "w") as f:
    f.write("\\n".join(rows) + "\\n")
print("proc", pid, "rows", len(rows), flush=True)
"""


@pytest.mark.parametrize("n_fm", [1, 2])
def test_two_process_classification(tmp_path, n_fm):
    nproc = 2
    port = 12500 + n_fm
    idx_base = fixture_path("synth", "synth")
    reads = fixture_path("synth", "reads.fq")
    script = _WORKER % dict(repo=REPO, port=port, idx=idx_base,
                            reads=reads)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = []
    outs = []
    for pid in range(nproc):
        out = tmp_path / f"shard{pid}.tsv"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script, str(pid), str(nproc),
             str(n_fm), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    for p in procs:
        so, se = p.communicate(timeout=600)
        assert p.returncode == 0, se[-3000:]

    merged = []
    for out in outs:
        merged += out.read_text().splitlines()
    golden = open(fixture_path(
        "synth", "golden_output.tsv")).read().splitlines()
    got_ids = {r.split("\t", 1)[0] for r in merged}
    want = [l for l in golden[1:] if l.split("\t", 1)[0] in got_ids]
    assert merged == want
