"""Sharding rules: map parameter paths to PartitionSpecs.

Data parallelism: every batch array shards its leading axis over "data".
Tensor parallelism: weight matrices shard over "model" following the
megatron-style column/row pattern —

- attention q/k/v projections and FFN up-projections: output axis sharded
  (column parallel), so heads/hidden split across chips;
- attention output and FFN down-projections: input axis sharded
  (row parallel), XLA inserts the psum;
- embeddings and vocoder channel-heavy convs: feature axis sharded;
- everything else (LayerNorm scales, biases, small predictors): replicated.

With these NamedShardings under jit, XLA's SPMD partitioner places the
all-gather/reduce-scatter collectives on the ICI mesh automatically.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-substring, param-name, spec) — first match wins.
_RULES: Tuple[Tuple[str, str, P], ...] = (
    # attention projections (Dense kernels are (in, out))
    ("w_q", "kernel", P(None, "model")),
    ("w_k", "kernel", P(None, "model")),
    ("w_v", "kernel", P(None, "model")),
    ("fc", "kernel", P("model", None)),
    # conv FFN kernels are (k, in, out)
    ("pos_ffn/w_1", "kernel", P(None, None, "model")),
    ("pos_ffn/w_2", "kernel", P(None, "model", None)),
    # embeddings: shard features
    ("src_word_emb", "embedding", P(None, "model")),
    # vocoder: channel-heavy convs shard output channels
    ("conv_pre", "v", P(None, None, "model")),
    ("up_", "v", P(None, None, "model")),
    ("res_", "v", P(None, None, None)),  # residual convs stay replicated
)


def _spec_for(path: str, name: str, ndim: int, mesh: Mesh) -> P:
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        return P()
    for frag, pname, spec in _RULES:
        if frag in path and name == pname and len(spec) <= ndim:
            return spec
    return P()


def param_sharding_rules(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching ``params``."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_of(kp, leaf):
        path = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )
        name = path.rsplit("/", 1)[-1]
        spec = _spec_for(path, name, leaf.ndim, mesh)
        # divisibility guard: replicate if the sharded dim doesn't divide
        for axis, s in enumerate(spec):
            if s is not None and leaf.shape[axis] % mesh.shape[s] != 0:
                return P()
        return spec

    specs = {
        jax.tree_util.keystr(kp): spec_of(kp, leaf) for kp, leaf in flat
    }

    def map_leaf(kp, leaf):
        return NamedSharding(mesh, specs[jax.tree_util.keystr(kp)])

    return jax.tree_util.tree_map_with_path(map_leaf, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for batch arrays."""
    return NamedSharding(mesh, P("data"))


def shard_params(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(params, param_sharding_rules(params, mesh))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf fully replicated on the mesh (optimizer moments,
    batch stats, step counters — anything without a TP rule)."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
