"""Block-family tests: every registered encoder/decoder pair runs the full
FastSpeech2 inference + training forward with finite outputs and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_tts_tpu.config import default_config
from e2e_tts_tpu.models import FastSpeech2, available_blocks
from e2e_tts_tpu.nn import FeatureStats
from e2e_tts_tpu.text import symbols

B, L, T_MEL = 2, 12, 48


def _cfg(block_type: str):
    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    bb = fs2.building_block.replace(block_type=block_type)
    # shrink every family's width for test speed
    bb = bb.replace(
        transformer=bb.transformer.replace(conv_filter_size=64),
        conformer=bb.conformer.replace(encoder_head=4, decoder_head=4),
        fastformer=bb.fastformer.replace(conv_filter_size=64),
        lstransformer=bb.lstransformer.replace(
            conv_filter_size=64, window_size=16, r=1
        ),
        reformer=bb.reformer.replace(
            encoder_head=4, decoder_head=4, bucket_size=8, n_hashes=2
        ),
    )
    return fs2.replace(
        encoder_layers=2, decoder_layers=2, encoder_hidden=64, decoder_hidden=64,
        building_block=bb,
        postnet=fs2.postnet.replace(embedding_dim=64, conv_layers=2),
    )


def test_all_families_registered():
    assert set(available_blocks()) == {
        "transformer", "conformer", "fastformer", "lstransformer", "reformer"
    }


@pytest.mark.parametrize("block_type", sorted(set(available_blocks()) - {"transformer"}))
def test_block_family_inference_and_training(block_type):
    model = FastSpeech2(
        config=_cfg(block_type),
        n_symbols=len(symbols),
        n_speakers=2,
        n_mel_channels=80,
        stats=FeatureStats(),
    )
    rng = np.random.RandomState(0)
    texts = jnp.asarray(rng.randint(4, len(symbols), (B, L)), jnp.int32)
    txt_lens = jnp.array([L, L - 3])
    mel = jnp.asarray(rng.randn(B, T_MEL, 80) * 0.1, jnp.float32)
    mel_lens = jnp.array([T_MEL, T_MEL - 10])
    prior = jnp.full((B, T_MEL, L), 1.0 / L, jnp.float32)

    train_kw = dict(
        speakers=jnp.zeros((B,), jnp.int32),
        texts=texts,
        txt_lens=txt_lens,
        max_mel_len=T_MEL,
        mel=mel,
        mel_lens=mel_lens,
        attn_prior=prior,
        pitch_target={"f0": mel[..., 0], "uv": (mel[..., 1] > 0).astype(jnp.float32)},
        energy_target=jnp.abs(mel[..., 2]),
        step=jnp.asarray(10000),
        train=True,
    )
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "lsh": jax.random.PRNGKey(2)}
    variables = model.init(rngs, **train_kw)

    # training forward
    out, _ = model.apply(
        variables, **train_kw,
        rngs={"dropout": jax.random.PRNGKey(3), "lsh": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert out["mel"].shape == (B, T_MEL, 80)
    assert np.isfinite(np.asarray(out["mel"])).all()

    # inference forward
    inf = model.apply(
        variables,
        speakers=jnp.zeros((B,), jnp.int32),
        texts=texts,
        txt_lens=txt_lens,
        max_mel_len=T_MEL,
    )
    assert inf["postnet_mel"].shape == (B, T_MEL, 80)
    assert np.isfinite(np.asarray(inf["postnet_mel"])).all()

    # gradient flow through the encoder embedding
    def loss(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            **train_kw,
            rngs={"dropout": jax.random.PRNGKey(5), "lsh": jax.random.PRNGKey(6)},
            mutable=["batch_stats"],
        )
        return jnp.mean(jnp.abs(o["mel"] - mel))

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    emb_grad = g["encoder"]["src_word_emb"]["embedding"]
    assert float(jnp.abs(emb_grad).sum()) > 0


def test_reformer_weight_tying():
    """weight_tie=True: layer params exist once regardless of depth."""
    from e2e_tts_tpu.nn.reformer import ReformerStack

    stack = ReformerStack(n_layers=3, d_model=32, n_head=4, n_local_heads=2,
                          bucket_size=8, n_hashes=2)
    x = jnp.zeros((1, 16, 32))
    mask = jnp.ones((1, 16), bool)
    vs = stack.init({"params": jax.random.PRNGKey(0)}, x, mask)
    names = set(vs["params"].keys())
    assert "attn_0" in names and "attn_1" not in names


def test_reformer_stack_grads_under_remat():
    """The stack is documented as running under nn.remat; gradients must
    flow through the rematerialized layers and stay finite."""
    from e2e_tts_tpu.nn.reformer import ReformerStack

    stack = ReformerStack(n_layers=2, d_model=32, n_head=4, n_local_heads=2,
                          bucket_size=8, n_hashes=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32), jnp.float32)
    mask = jnp.ones((2, 32), bool)
    vs = stack.init({"params": jax.random.PRNGKey(0)}, x, mask)

    def loss(params):
        out = stack.apply({"params": params}, x, mask)
        return jnp.sum(out**2)

    g = jax.grad(loss)(vs["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(p)).all() for p in leaves)
    assert sum(float(jnp.abs(p).sum()) for p in leaves) > 0


def test_lsh_attention_accuracy_vs_dense_t1024():
    """T=1024 LSH-vs-dense measurement (round-1 verdict item): with
    clustered queries/keys the bucketed approximation must track full dense
    causal attention closely."""
    from e2e_tts_tpu.nn.reformer import lsh_attention

    rng = np.random.RandomState(0)
    B, T, D = 2, 1024, 64
    # 16 sharp cluster directions: LSH rounds should co-bucket each cluster
    centers = rng.randn(16, D).astype(np.float32) * 4.0
    assign = rng.randint(0, 16, size=(B, T))
    qk = centers[assign] + 0.05 * rng.randn(B, T, D).astype(np.float32)
    v = rng.randn(B, T, D).astype(np.float32)
    mask = np.ones((B, T), bool)

    out_lsh = np.asarray(
        lsh_attention(
            jnp.asarray(qk), jnp.asarray(v), jnp.asarray(mask),
            jax.random.PRNGKey(3), n_hashes=4, bucket_size=64, causal=True,
        )
    )

    # dense oracle with the kernel's score convention: q . normalize(k),
    # causal, self-attention excluded (reference TOKEN_SELF_ATTN_VALUE)
    kn = qk / np.maximum(np.linalg.norm(qk, axis=-1, keepdims=True), 1e-6)
    s = np.einsum("btd,bsd->bts", qk, kn) / np.sqrt(D)
    causal = np.tril(np.ones((T, T), bool))
    s = np.where(causal[None], s, -1e9)
    ii = np.arange(T)
    s[:, ii, ii] = -5e4  # self-attention penalty
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out_dense = np.einsum("bts,bsd->btd", p, v)

    # skip the first few positions (few causal candidates -> noisy)
    a, b = out_lsh[:, 8:], out_dense[:, 8:]
    cos = np.sum(a * b, -1) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-9
    )
    assert cos.mean() > 0.90, cos.mean()


def test_fastformer_weight_tying():
    from e2e_tts_tpu.nn.fastformer import FastformerStack

    stack = FastformerStack(n_layers=2, d_model=32, n_head=2, d_inner=64)
    x = jnp.zeros((1, 16, 32))
    mask = jnp.ones((1, 16), bool)
    vs = stack.init({"params": jax.random.PRNGKey(0)}, x, mask)
    # shared q/k logit projections live at the stack level, once
    assert "to_q_attn_logits" in vs["params"]
    assert "to_q_attn_logits" not in vs["params"].get("attn_0", {})


@pytest.mark.parametrize(
    "family", ["transformer", "conformer", "fastformer", "lstransformer"]
)
def test_remat_same_math_and_params(family):
    """remat_blocks=True must be numerically transparent: identical param
    trees, identical forward outputs, identical gradients — only the
    backward-pass memory schedule changes (jax.checkpoint per layer)."""
    from e2e_tts_tpu.models.blocks import build_decoder, build_encoder

    fs2 = _cfg(family)
    B, T = 2, 33
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 1, 20)
    mask = jnp.arange(T)[None, :] < jnp.array([[T], [T - 9]])

    outs, grads, trees = [], [], []
    for remat in (False, True):
        enc = build_encoder(fs2.replace(remat_blocks=remat), n_symbols=40)
        vs = enc.init({"params": jax.random.PRNGKey(0)}, ids, mask)
        trees.append(jax.tree_util.tree_structure(vs))
        extra = {k: v for k, v in vs.items() if k != "params"}

        def loss(params):
            x, _ = enc.apply({"params": params, **extra}, ids, mask)
            return (x * mask[..., None]).sum()

        outs.append(enc.apply(vs, ids, mask)[0])
        grads.append(jax.grad(loss)(vs["params"]))

    assert trees[0] == trees[1]
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)

    # remat must actually be IN the computation (a silent no-op would pass
    # the numerics check): the grad jaxpr contains checkpoint regions
    enc_r = build_encoder(fs2.replace(remat_blocks=True), n_symbols=40)
    vs_r = enc_r.init({"params": jax.random.PRNGKey(0)}, ids, mask)
    extra_r = {k: v for k, v in vs_r.items() if k != "params"}

    def loss_r(params):
        x, _ = enc_r.apply({"params": params, **extra_r}, ids, mask)
        return (x * mask[..., None]).sum()

    jaxpr = str(jax.make_jaxpr(jax.grad(loss_r))(vs_r["params"]))
    assert "remat" in jaxpr, f"{family}: remat_blocks=True produced no remat"

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), *grads
    )

    # decoder path too (smoke: builds + same output under remat)
    dec_a = build_decoder(fs2.replace(remat_blocks=False))
    dec_b = build_decoder(fs2.replace(remat_blocks=True))
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, fs2.decoder_hidden))
    vd = dec_a.init({"params": jax.random.PRNGKey(0)}, x, mask)
    ya = dec_a.apply(vd, x, mask)[0]
    yb = dec_b.apply(vd, x, mask)[0]
    np.testing.assert_allclose(ya, yb, atol=1e-6)
