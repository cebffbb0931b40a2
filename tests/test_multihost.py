"""Multi-host training: REAL two-process equivalence.

The reference is one Python process on one device (SURVEY §2.4 — no
distributed backend at all). parallel/multihost.py makes the GSPMD trainer
span processes; here we actually spawn TWO separate Python processes (4
virtual CPU devices each), wire them with jax.distributed over a local
coordinator, train through make_sharded_trainer on the global {data: 8}
mesh WITH fsdp (so params/moments shard across processes), and require the
loss trajectory to match the single-process single-device oracle.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, sys.argv[3])
from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
from trade_aid_multimodal_transformer_tpu.models.init import init_params
from trade_aid_multimodal_transformer_tpu.parallel import (
    make_mesh, make_sharded_trainer, multihost, shard_train_state,
)
from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
from trade_aid_multimodal_transformer_tpu.train.steps import make_optimizer

pid, port = int(sys.argv[1]), sys.argv[2]
multihost.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
devs = jax.devices()
assert len(devs) == 8, devs  # 2 processes x 4 local

cfg = ModelConfig(
    vocab_sizes=(48, 12), cross_attention=(True, False), n_embd=32,
    n_head=4, n_layer=2, block_size=8, dropout=0.1, attn_impl="jnp",
)
rng = np.random.default_rng(0)
n = 512
train = [rng.integers(0, v, n - 64).astype(np.int32) for v in cfg.vocab_sizes]
val = [rng.integers(0, v, 64).astype(np.int32) for v in cfg.vocab_sizes]
feed = BatchFeed(train, val, [n], cfg.block_size, 16, is_percents=False,
                 rand_sizes=[1, None], vocab_sizes=list(cfg.vocab_sizes))
optimizer = make_optimizer(1e-3)
specs = build_metric_specs(
    [list(np.linspace(-1.0, 1.0, v)) for v in cfg.vocab_sizes],
    [False, False], cfg.block_size,
)
mesh = make_mesh(8, 1, devs)
trainer = make_sharded_trainer(cfg, feed, optimizer, specs, 2, mesh,
                               model_axis=False)
params = init_params(jax.random.PRNGKey(0), cfg)
params, opt_state = shard_train_state(
    params, optimizer, mesh, cfg.n_head, model_axis=False, fsdp=True,
)
# fsdp across processes: this process must hold only its 4/8 of each leaf
w1 = params["blocks"][0]["ffwd"]["w1"]
local_elems = sum(int(np.prod(s.data.shape)) for s in w1.addressable_shards)
assert local_elems == int(np.prod(w1.shape)) // 2, (local_elems, w1.shape)

params, opt_state, losses = trainer.train_chunk(
    params, opt_state, jax.random.PRNGKey(1), 3
)
stats = trainer.eval_pass(params, jax.random.PRNGKey(2), "val")
ckpt_path = sys.argv[4]
from trade_aid_multimodal_transformer_tpu.train.checkpoint import save_checkpoint
size = save_checkpoint(ckpt_path, params, opt_state, step=3)
assert size > 0

print("RESULT" + json.dumps({
    "pid": pid,
    "losses": [float(x) for x in np.asarray(jax.device_get(losses))],
    "eval": float(stats.mean_loss),
}), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_fsdp_matches_single_device_oracle(tmp_path):
    port = _free_port()
    ckpt = tmp_path / "mh_model.npz"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), str(port), str(REPO),
             str(ckpt)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(REPO),
        )
        for i in range(2)
    ]
    results = {}
    logs = {}
    for p in procs:
        out, _ = p.communicate(timeout=420)
        text = out.decode()
        logs[p.pid] = text
        assert p.returncode == 0, f"worker failed:\n{text[-4000:]}"
        for line in text.splitlines():
            if line.startswith("RESULT"):
                r = json.loads(line[len("RESULT"):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, logs

    # Both processes see the same global losses (one SPMD program).
    np.testing.assert_allclose(
        results[0]["losses"], results[1]["losses"], rtol=0, atol=0
    )
    assert results[0]["eval"] == results[1]["eval"]

    # Single-process, single-device oracle with the same keys (this test
    # process has the 8-device conftest platform; use one device's Trainer).
    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
    from trade_aid_multimodal_transformer_tpu.train.metrics import (
        build_metric_specs,
    )
    from trade_aid_multimodal_transformer_tpu.train.steps import (
        Trainer, make_optimizer,
    )

    cfg = ModelConfig(
        vocab_sizes=(48, 12), cross_attention=(True, False), n_embd=32,
        n_head=4, n_layer=2, block_size=8, dropout=0.1, attn_impl="jnp",
    )
    rng = np.random.default_rng(0)
    n = 512
    train = [rng.integers(0, v, n - 64).astype(np.int32) for v in cfg.vocab_sizes]
    val = [rng.integers(0, v, 64).astype(np.int32) for v in cfg.vocab_sizes]
    feed = BatchFeed(train, val, [n], cfg.block_size, 16, is_percents=False,
                     rand_sizes=[1, None], vocab_sizes=list(cfg.vocab_sizes))
    optimizer = make_optimizer(1e-3)
    specs = build_metric_specs(
        [list(np.linspace(-1.0, 1.0, v)) for v in cfg.vocab_sizes],
        [False, False], cfg.block_size,
    )
    trainer = Trainer(cfg, feed, optimizer, specs, 2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    p, o, oracle_losses = trainer.train_chunk(
        params, optimizer.init(params), jax.random.PRNGKey(1), 3
    )
    oracle_eval = float(trainer.eval_pass(p, jax.random.PRNGKey(2), "val").mean_loss)

    np.testing.assert_allclose(
        results[0]["losses"], np.asarray(oracle_losses), rtol=1e-5, atol=1e-6
    )
    assert results[0]["eval"] == pytest.approx(oracle_eval, abs=1e-5)

    # The checkpoint written by process 0 (leaves all-gathered from the
    # process-sharded state) must hold FULL arrays matching the oracle's
    # post-chunk params.
    from trade_aid_multimodal_transformer_tpu.train.checkpoint import (
        load_checkpoint,
    )

    assert ckpt.exists()
    loaded, _, step, _ = load_checkpoint(str(ckpt), p)
    assert step == 3
    for a, b in zip(jax.tree_util.tree_leaves(loaded), jax.tree_util.tree_leaves(p)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )
