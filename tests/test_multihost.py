"""Genuine multi-PROCESS validation on the CPU backend.

The reference could only ever test its distributed code at
world_size=1 (SURVEY.md §4); here two actual `jax.distributed`
processes (gloo, 4 virtual CPU devices each) run the fused LEAF step
over a stitched global batch and must agree bit-for-bit: same global
loss, same psum-averaged parameters on every host.
"""
import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys, json
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", 2, proc_id)
    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, %(repo)r)
    from jax.sharding import Mesh
    from leaf_tpu.models import create_model
    from leaf_tpu.parallel.mesh import replicate
    from leaf_tpu.parallel.distributed import broadcast_object
    from leaf_tpu.tokenizer import get_tokenizer
    from leaf_tpu.train.fused import FusedLeafStep
    from leaf_tpu.train.optim import make_optimizer
    from leaf_tpu.train.schedules import cosine_lr
    from leaf_tpu.train.step import TrainState

    ALL = [f"a photo of object number {i} on a table" for i in range(8)]
    local_texts = ALL[proc_id * 4:(proc_id + 1) * 4]

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    model = create_model("ViT-tiny-test")
    tok = get_tokenizer()
    tx = make_optimizer(cosine_lr(1e-3, 1, 100), weight_decay=1e-4)
    params = replicate(model.params["text"], mesh)
    frozen = replicate(jax.tree.map(np.asarray, model.params["text"]), mesh)
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    fused = FusedLeafStep(model.cfg, tx, tok, rho=4, mesh=mesh)

    # record the dispatched probe-buffer widths + which phase-1 branch
    # ran: multi-host steps must stay BUCKETED (width 16 here, not the
    # full 77) and the anchor-cache branch must be uniform across hosts
    # (VERDICT r4 weak #2)
    widths, branches = [], []
    _p1, _p1c = fused.phase1, fused.phase1_cached
    def p1(frozen_t, train_t, clean_t, probes):
        widths.append(int(probes.shape[-1])); branches.append("full")
        return _p1(frozen_t, train_t, clean_t, probes)
    def p1c(train_t, probes, anch):
        widths.append(int(probes.shape[-1])); branches.append("cached")
        return _p1c(train_t, probes, anch)
    fused.phase1, fused.phase1_cached = p1, p1c

    rng = np.random.default_rng(7 + proc_id)
    state, info = fused(state, frozen, local_texts, rng)
    loss1 = float(info["metrics"]["loss"])
    # step 2: same captions -> every host hits its anchor cache -> the
    # coordinated decision picks the cached dispatch on BOTH hosts
    state, info = fused(state, frozen, local_texts, rng)
    loss2 = float(info["metrics"]["loss"])
    # step 3: host 0 repeats (local cache hit), host 1 brings NEW
    # captions (miss) -> the global decision must fall back to the full
    # phase1 on BOTH hosts (a divergent branch would deadlock here)
    texts3 = local_texts if proc_id == 0 else \
        [f"an unseen fresh caption number {i}" for i in range(4)]
    state, info = fused(state, frozen, texts3, rng)
    loss3 = float(info["metrics"]["loss"])
    # host-side object broadcast must agree too
    tag = broadcast_object({"from_rank0": True} if proc_id == 0 else None)
    probe = np.concatenate([np.asarray(x).ravel()[:5]
                            for x in jax.tree.leaves(state.text_params)])
    print(json.dumps({
        "proc": proc_id,
        "loss": loss1, "loss2": loss2, "loss3": loss3,
        "widths": widths, "branches": branches,
        "probe": probe.tolist(),
        "bcast_ok": tag == {"from_rank0": True},
    }), flush=True)
""") % {"repo": REPO}


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_fused_step_agrees(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    a, b = sorted(outs, key=lambda o: o["proc"])
    assert a["bcast_ok"] and b["bcast_ok"]
    # the global loss is computed over the stitched 8-caption batch and
    # must be identical on both hosts; so must the updated params
    assert a["loss"] == b["loss"]
    assert a["loss2"] == b["loss2"]
    assert a["loss3"] == b["loss3"]
    np.testing.assert_array_equal(np.asarray(a["probe"]),
                                  np.asarray(b["probe"]))
    # multi-host steps stay BUCKETED: the ~10-token captions land in
    # the 16 bucket on every dispatch (the old behavior fell back to
    # the full 77 whenever process_count > 1)
    assert set(a["widths"]) == set(b["widths"]) == {16}, (a, b)
    # step 1 misses (full phase1), step 2 hits on both hosts (cached),
    # step 3 is a split hit/miss -> coordinated to the full phase1 on
    # BOTH hosts
    assert a["branches"] == b["branches"] == ["full", "cached", "full"], \
        (a["branches"], b["branches"])


DRIVER_WORKER = textwrap.dedent("""
    import os, sys, json
    proc_id = int(sys.argv[1]); port = sys.argv[2]; logs = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", 2, proc_id)
    sys.path.insert(0, %(repo)r)
    import numpy as np
    import leaf_tpu.train.driver as driver

    ARGS = [
        "--model", "ViT-tiny-test", "--dataset-type", "synthetic",
        "--train-num-samples", "8", "--batch-size", "4",
        "--rho", "3", "--use_charmer", "--warmup", "1",
        "--lr", "1e-3", "--zeroshot-frequency", "0",
        "--log-every-n-steps", "1", "--logs", logs, "--name", "mh",
    ]
    out1 = driver.main(ARGS + ["--epochs", "1"])
    out2 = driver.main(ARGS + ["--epochs", "2", "--resume", "latest"])
    print(json.dumps({
        "proc": proc_id,
        "rows1": out1["results"] if proc_id == 0 else None,
        "rows2": out2["results"] if proc_id == 0 else None,
        "step": int(out2["state"].step),
        "is_master_rows_none": out1["results"] == [] if proc_id else None,
    }), flush=True)
""") % {"repo": REPO}


@pytest.mark.timeout(900)
def test_two_process_driver_end_to_end(tmp_path):
    """VERDICT r2 next #6: the whole driver — master-gated ledgers,
    checkpoint save, resume broadcast — across two real processes.

    Charmer attack (deterministic, no rng) + the synthetic dataset's
    identical captions make the two-process global-batch-8 run exactly
    comparable to a single-process batch-8 run."""
    script = tmp_path / "driver_worker.py"
    script.write_text(DRIVER_WORKER)
    logs = tmp_path / "logs"
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port), str(logs)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=840)
        assert p.returncode == 0, err[-4000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    a, b = sorted(outs, key=lambda o: o["proc"])

    # master wrote the ledgers; both runs completed and stepped
    run_dir = logs / "mh"
    assert (run_dir / "results.csv").exists()
    assert (run_dir / "times_True.csv").exists()
    # per-host 8 samples, bs 4 -> 2 steps/epoch; resumed to epoch 2
    assert a["step"] == b["step"] == 4
    epochs = [int(r["epoch"]) for r in a["rows2"]]
    assert epochs == [0, 1, 2]

    # equivalence vs a single-process run at the same GLOBAL batch and
    # step count (bs 8 = 2 hosts x 4; 16 global samples = 2 steps, the
    # per-host 8-sample pipelines stitched): identical captions +
    # deterministic charmer -> identical per-step loss up to reduction
    # order
    from tests.test_training import run_driver
    sp = run_driver(tmp_path, ["--train-num-samples", "16",
                               "--batch-size", "8", "--rho", "3",
                               "--use_charmer", "--warmup", "1",
                               "--lr", "1e-3", "--name", "sp-equiv"])
    sp_loss = float(sp["results"][-1]["train_loss"])
    mh_loss = float(a["rows1"][-1]["train_loss"])
    np.testing.assert_allclose(mh_loss, sp_loss, rtol=1e-4)


CONTRASTIVE_WORKER = textwrap.dedent("""
    import os, sys, json
    proc_id = int(sys.argv[1]); port = sys.argv[2]; logs = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", 2, proc_id)
    sys.path.insert(0, %(repo)r)
    import leaf_tpu.train.contrastive_driver as cd

    ARGS = [
        "--model", "ViT-tiny-test", "--dataset-type", "synthetic",
        "--train-num-samples", "8", "--batch-size", "4",
        "--warmup", "1", "--lr", "1e-3",
        "--logs", logs, "--name", "mhc", "--epochs", "1",
    ]
    out = cd.main(ARGS)
    print(json.dumps({"proc": proc_id,
                      "step": int(out["state"].step)}), flush=True)
""") % {"repo": REPO}


@pytest.mark.timeout(900)
def test_two_process_contrastive_driver(tmp_path):
    """The contrastive pretrainer CLI across two real processes:
    collective orbax saves, shard_map'd InfoNCE over the global batch."""
    script = tmp_path / "cworker.py"
    script.write_text(CONTRASTIVE_WORKER)
    logs = tmp_path / "logs"
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port), str(logs)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=840)
        assert p.returncode == 0, err[-4000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert all(o["step"] == 2 for o in outs)
    assert (logs / "mhc" / "results.csv").exists()


BUCKET_WORKER = textwrap.dedent("""
    import os, sys, json
    proc_id = int(sys.argv[1]); port = sys.argv[2]; tars = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", 2, proc_id)
    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, %(repo)r)
    from jax.sharding import Mesh
    from leaf_tpu.data.wds import WdsConfig, WdsDataset
    from leaf_tpu.models import create_model
    from leaf_tpu.parallel.mesh import replicate
    from leaf_tpu.tokenizer import get_tokenizer
    from leaf_tpu.train.fused import FusedLeafStep
    from leaf_tpu.train.optim import make_optimizer
    from leaf_tpu.train.schedules import cosine_lr
    from leaf_tpu.train.step import TrainState

    tok = get_tokenizer()
    cfg = WdsConfig(urls=os.path.join(tars, "s-{000..001}.tar"),
                    batch_size=4, is_train=True, num_samples=16, seed=0,
                    text_only=True, bucket_by_length=True,
                    length_fn=lambda t: len(tok.encode(t)) + 2,
                    process_index=proc_id, process_count=2,
                    sample_shuffle_size=8, sample_shuffle_initial=2)
    batches = [texts for _, texts in WdsDataset(cfg, None)]

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    model = create_model("ViT-tiny-test")
    tx = make_optimizer(cosine_lr(1e-3, 1, 100), weight_decay=1e-4)
    params = replicate(model.params["text"], mesh)
    frozen = replicate(jax.tree.map(np.asarray, model.params["text"]), mesh)
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    fused = FusedLeafStep(model.cfg, tx, tok, rho=4, mesh=mesh)

    widths = []
    _p1, _p1c = fused.phase1, fused.phase1_cached
    def p1(frozen_t, train_t, clean_t, probes):
        widths.append(int(probes.shape[-1]))
        return _p1(frozen_t, train_t, clean_t, probes)
    def p1c(train_t, probes, anch):
        widths.append(int(probes.shape[-1]))
        return _p1c(train_t, probes, anch)
    fused.phase1, fused.phase1_cached = p1, p1c

    rng = np.random.default_rng(11 + proc_id)
    losses, word_sets = [], []
    for texts in batches:
        word_sets.append(sorted({len(t.split()) for t in texts}))
        state, info = fused(state, frozen, texts, rng)
        losses.append(float(info["metrics"]["loss"]))
    print(json.dumps({"proc": proc_id, "losses": losses,
                      "widths": widths, "word_sets": word_sets}),
          flush=True)
""") % {"repo": REPO}


@pytest.mark.timeout(600)
def test_two_process_bucket_by_length(tmp_path):
    """--bucket-by-length composed with the coordinated bucket
    allgather: each host's wds pipeline emits length-HOMOGENEOUS
    batches from its own shard slice; the realized dispatch width per
    step is the max over the two hosts' batch buckets, identical on
    both; global losses agree."""
    import io
    import tarfile

    tars = tmp_path / "tars"
    tars.mkdir()
    # shard 0: all short (2-word) captions; shard 1: half short, half
    # long (30 single-token words -> 32 caption tokens -> probe
    # buffers overflow into the 48 bucket)
    lengths = {0: [2] * 8, 1: [2, 30] * 4}
    for s, lens in lengths.items():
        with tarfile.open(tars / f"s-{s:03d}.tar", "w") as tf:
            for i, n_words in enumerate(lens):
                txt = " ".join(["word"] * n_words).encode()
                info = tarfile.TarInfo(f"{s}-{i:04d}.txt")
                info.size = len(txt)
                tf.addfile(info, io.BytesIO(txt))

    script = tmp_path / "bucket_worker.py"
    script.write_text(BUCKET_WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port), str(tars)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    a, b = sorted(outs, key=lambda o: o["proc"])

    # per-host batches are length-homogeneous
    for o in (a, b):
        assert all(len(ws) == 1 for ws in o["word_sets"]), o["word_sets"]
    # global losses identical (psum over the stitched batch)
    np.testing.assert_array_equal(a["losses"], b["losses"])
    # realized dispatch width per step == max over the hosts' batch
    # buckets (2-word -> 16, 30-word -> 48), identical on both hosts
    assert a["widths"] == b["widths"], (a["widths"], b["widths"])
    expect = [48 if (wa == [30] or wb == [30]) else 16
              for wa, wb in zip(a["word_sets"], b["word_sets"])]
    assert a["widths"] == expect, (a["widths"], a["word_sets"],
                                   b["word_sets"])
