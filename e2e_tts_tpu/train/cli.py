"""Training drivers.

The reference ships losses/optimizers/dataloaders but no train script
(SURVEY.md §0 — confirmed absent); these drivers complete the stack:

    python train.py prepare  --corpus DIR [...] --workdir OUT
    python train.py acoustic --workdir OUT [--steps N] [--supervised]
    python train.py vocoder  --workdir OUT [--steps N] [--istft]

Training runs data-parallel over all visible devices via a (data, model)
mesh; checkpoints are orbax-managed and the deploy bundle is written on
completion so serving can load the result directly.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _lang_symbols(lang: str):
    """(n_symbols, symbol_table) for a frontend language."""
    from ..text.frontends import get_frontend

    fe = get_frontend(lang)
    # the VN table is the dataset default; None keeps that fast path
    return len(fe.symbols), (None if lang == "vie" else fe.symbol_to_id)


def e2e_optimizers(config, am_scale: float = 1.0, d_scale: float = 1.0):
    """(acoustic, generator, discriminator) optimizers for the joint e2e
    fine-tune.  The acoustic/discriminator transforms are always chained
    with a scale stage so the opt-state STRUCTURE is identical whatever the
    --am-lr-scale/--d-lr-scale values — e2e checkpoints restore against the
    same template regardless of how they were trained (cmd_export)."""
    from ..train import acoustic_optimizer, gan_optimizer

    am = optax.chain(
        acoustic_optimizer(
            config.train.fastspeech2_optimizer,
            config.models.fastspeech2.encoder_hidden,
        ),
        optax.scale(am_scale),
    )
    g = gan_optimizer(config.train.hifigan_optimizer)
    d = optax.chain(
        gan_optimizer(config.train.hifigan_optimizer), optax.scale(d_scale)
    )
    return am, g, d


def warm_start_params(params, bundle_dir: str):
    """Graft a deploy bundle's acoustic weights onto a fresh train state for
    fine-tuning on a new voice (SURVEY §7 config[4]): leaves with matching
    shapes copy over; a speaker-embedding table with a different number of
    rows copies the overlapping speakers and initializes NEW speakers from
    the bundle's mean voice.  Mismatched-architecture leaves keep their
    fresh init with a warning."""
    import warnings

    from flax import serialization

    with open(os.path.join(bundle_dir, "acoustic.msgpack"), "rb") as f:
        blob = f.read()
    # deserialize against the target structure; shape mismatches surface as
    # raw arrays we handle below
    src_tree = serialization.msgpack_restore(blob)
    src_params = src_tree.get("params", src_tree)

    def graft(dst, src, path=""):
        if isinstance(dst, dict):
            out = {}
            for k, v in dst.items():
                if isinstance(src, dict) and k in src:
                    out[k] = graft(v, src[k], f"{path}/{k}")
                else:
                    warnings.warn(f"warm start: no source for {path}/{k}")
                    out[k] = v
            return out
        src_arr = np.asarray(src)
        dst_arr = np.asarray(dst)
        if src_arr.shape == dst_arr.shape:
            return jnp.asarray(src_arr, dst_arr.dtype)
        if (
            "speaker_emb" in path
            and src_arr.ndim == dst_arr.ndim == 2
            and src_arr.shape[1] == dst_arr.shape[1]
        ):
            out = np.empty_like(dst_arr)
            n = min(len(src_arr), len(dst_arr))
            out[:n] = src_arr[:n]
            if len(dst_arr) > n:  # new speakers start from the mean voice
                out[n:] = src_arr.mean(axis=0)
            return jnp.asarray(out, dst_arr.dtype)
        warnings.warn(
            f"warm start: shape mismatch at {path} "
            f"{src_arr.shape} vs {dst_arr.shape}; keeping fresh init"
        )
        return dst

    return graft(params, src_params)


def cmd_prepare(args):
    from ..config import default_config, load_config
    from ..data import (
        build_speaker_map,
        compute_stats,
        create_unsupervised_filelist,
        create_supervised_filelist,
        create_utterance_features,
        read_filelist,
    )

    config = load_config(args.config) if args.config else default_config()
    os.makedirs(args.workdir, exist_ok=True)
    filelist = os.path.join(args.workdir, "file_list.txt")

    if args.supervised:
        create_supervised_filelist(args.corpus, filelist)
    else:
        _, skipped = create_unsupervised_filelist(
            args.corpus, filelist, lang=args.lang
        )
        if skipped:
            print(f"[prepare] skipped {len(skipped)} OOV utterances")

    entries = read_filelist(filelist)
    t0 = time.time()
    for i, (wav, *_rest) in enumerate(entries):
        create_utterance_features(wav, config, overwrite=args.overwrite)
        if (i + 1) % 100 == 0:
            print(f"[prepare] features {i + 1}/{len(entries)} ({time.time() - t0:.0f}s)")

    stats = compute_stats(entries)
    with open(os.path.join(args.workdir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    speakers = build_speaker_map(entries)
    with open(os.path.join(args.workdir, "speakers.json"), "w") as f:
        json.dump(speakers, f, ensure_ascii=False, indent=1)
    print(f"[prepare] {len(entries)} utterances, {len(speakers)} speakers -> {args.workdir}")


def _load_workdir(workdir: str):
    from ..data import read_filelist

    entries = read_filelist(os.path.join(workdir, "file_list.txt"))
    with open(os.path.join(workdir, "stats.json")) as f:
        stats = json.load(f)
    with open(os.path.join(workdir, "speakers.json")) as f:
        speakers = json.load(f)
    return entries, stats, speakers




def _apply_supervised(config):
    """MFA-duration mode: learn_alignment=False changes the DurationPredictor
    architecture and drops the aligner, so EVERY command that rebuilds the
    model from config (acoustic, e2e, export, generate-mels) must apply the
    same rewrite or checkpoint restore fails on a mismatched tree."""
    fs2 = config.models.fastspeech2
    return config.replace(
        models=config.models.replace(
            fastspeech2=fs2.replace(
                variance=fs2.variance.replace(
                    duration_modelling=fs2.variance.duration_modelling.replace(
                        learn_alignment=False
                    )
                )
            )
        )
    )


def cmd_acoustic(args):
    from ..config import default_config, load_config
    from ..data import AcousticDataset, make_acoustic_batches, split_train_valid
    from ..models import FastSpeech2
    from ..nn import FeatureStats
    from ..parallel import batch_sharding, make_data_mesh, param_sharding_rules
    from ..train import (
        acoustic_optimizer,
        init_train_state,
        make_eval_step,
        make_train_step,
    )
    from ..train.checkpoint import CheckpointManager
    from ..utils.logging import AcousticLogger
    from .optim import noam_schedule

    config = load_config(args.config) if args.config else default_config()
    if args.supervised:
        config = _apply_supervised(config)

    entries, stats, speakers = _load_workdir(args.workdir)
    train_entries, valid_entries = split_train_valid(entries, seed=config.train.seed)
    n_symbols, symbol_table = _lang_symbols(args.lang)
    dataset = AcousticDataset(
        train_entries,
        speakers,
        stats,
        config,
        supervised=args.supervised,
        prior_cache_dir=os.path.join(args.workdir, "priors"),
        symbol_table=symbol_table,
    )

    model = FastSpeech2(
        config=config.models.fastspeech2,
        n_symbols=n_symbols,
        n_speakers=len(speakers),
        n_mel_channels=config.audio.mel.channels,
        stats=FeatureStats.from_dict(stats),
        dtype=jnp.bfloat16 if config.train.mixed_precision else jnp.float32,
    )
    optimizer = acoustic_optimizer(
        config.train.fastspeech2_optimizer, config.models.fastspeech2.encoder_hidden
    )
    schedule = noam_schedule(
        config.models.fastspeech2.encoder_hidden,
        config.train.fastspeech2_optimizer.warm_up_step,
        config.train.fastspeech2_optimizer.anneal_steps,
        config.train.fastspeech2_optimizer.anneal_rate,
    )
    n_words = max(config.models.fastspeech2.max_seq_len, 256)
    train_step = jax.jit(make_train_step(model, config, optimizer, n_words=n_words))
    eval_step = jax.jit(make_eval_step(model, config, n_words=n_words))

    mesh = make_data_mesh(config.train.batch_size)
    data_sh = batch_sharding(mesh)

    state = init_train_state(model, optimizer, jax.random.PRNGKey(config.train.seed))
    ckpt = CheckpointManager(os.path.join(args.workdir, "acoustic_ckpt"))
    if getattr(args, "init_from", None) and ckpt.latest_step() is None:
        state = state._replace(
            params=warm_start_params(state.params, args.init_from)
        )
        print(f"[acoustic] warm-started from bundle {args.init_from}")
    # mesh placement: params per TP rules, everything else replicated
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    state_shardings = state._replace(
        params=param_sharding_rules(state.params, mesh),
        batch_stats=jax.tree_util.tree_map(lambda _: repl, state.batch_stats),
        opt_state=jax.tree_util.tree_map(lambda _: repl, state.opt_state),
        step=repl,
    )
    if ckpt.latest_step() is not None:
        # restore each shard straight onto its mesh position — no host
        # gather + re-placement round trip (matters past one host's RAM)
        state = ckpt.restore_sharded(state, state_shardings)
        print(f"[acoustic] resumed from step {int(state.step)}")
    else:
        state = state._replace(
            params=jax.device_put(state.params, state_shardings.params),
            batch_stats=jax.device_put(state.batch_stats, repl),
            opt_state=jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), state.opt_state
            ),
            step=jax.device_put(state.step, repl),
        )

    valid_dataset = AcousticDataset(
        valid_entries, speakers, stats, config,
        supervised=args.supervised,
        prior_cache_dir=os.path.join(args.workdir, "priors"),
        symbol_table=symbol_table,
    )

    def run_validation(state, step):
        """Average eval losses over the held-out split — a dedicated
        deterministic pass (dropout off, no grads, no optimizer math)."""
        totals, n = {}, 0
        for vb in make_acoustic_batches(
            valid_dataset, config.train.batch_size, shuffle=False
        ):
            vb = jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.asarray(x), data_sh), vb
            )
            m = eval_step(state, vb)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        return {f"valid_{k}": v / max(n, 1) for k, v in totals.items()}

    logger = AcousticLogger(os.path.join(args.workdir, "logs", "acoustic"))
    rng = jax.random.PRNGKey(config.train.seed)
    step = int(state.step)
    epoch = 0
    t0 = time.time()
    from ..utils.prefetch import prefetch_iterator

    with mesh:
        while step < args.steps:
            for batch in prefetch_iterator(
                make_acoustic_batches(
                    dataset, config.train.batch_size, seed=config.train.seed + epoch
                ),
                size=2,
            ):
                batch = jax.tree_util.tree_map(
                    lambda x: jax.device_put(jnp.asarray(x), data_sh), batch
                )
                rng, sub = jax.random.split(rng)
                state, metrics = train_step(state, batch, sub)
                # host-side step counter: int(state.step) would block on the
                # device every iteration and kill dispatch pipelining; the
                # host only syncs when it actually reads metrics below
                step += 1
                if step % config.train.log_step == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    logger.log(step, m, lr=float(schedule(step)))
                    print(
                        f"[acoustic] step {step} total={m['total']:.4f} "
                        f"mel={m['mel']:.4f} ({time.time() - t0:.0f}s)"
                    )
                if step % args.ckpt_every == 0:
                    ckpt.save(step, state)  # sharded arrays save per-shard
                    logger.log_params(step, jax.device_get(state.params))
                    if valid_entries:
                        vm = run_validation(state, step)
                        logger.log(step, vm)
                        print(
                            f"[acoustic] step {step} valid_total="
                            f"{vm.get('valid_total', float('nan')):.4f}"
                        )
                if step >= args.steps:
                    break
            epoch += 1
    ckpt.save(step, state, wait=True)
    print(f"[acoustic] done at step {step}")


def cmd_vocoder(args):
    from ..config import default_config, load_config
    from ..data import VocoderDataset, make_vocoder_batches, split_train_valid
    from ..models import build_generator
    from ..train import (
        gan_optimizer,
        init_vocoder_train_state,
        make_vocoder_train_step,
    )
    from ..train.checkpoint import CheckpointManager
    from ..utils.logging import ScalarWriter

    config = load_config(args.config) if args.config else default_config()
    entries, stats, speakers = _load_workdir(args.workdir)
    train_entries, _ = split_train_valid(entries, seed=config.train.seed)

    kind = "istft" if args.istft else "hifigan"
    gen = build_generator(config, kind)
    g_opt = gan_optimizer(config.train.hifigan_optimizer)
    d_opt = gan_optimizer(config.train.hifigan_optimizer)
    step_fn = jax.jit(make_vocoder_train_step(gen, config, g_opt, d_opt, kind))
    state = init_vocoder_train_state(gen, config, g_opt, d_opt, jax.random.PRNGKey(0))

    ckpt = CheckpointManager(os.path.join(args.workdir, f"vocoder_{kind}_ckpt"))
    if getattr(args, "init_from", None) and ckpt.latest_step() is None:
        from flax import serialization

        with open(os.path.join(args.init_from, "vocoder.msgpack"), "rb") as f:
            src_tree = serialization.msgpack_restore(f.read())
        state = state._replace(
            g_params=jax.tree_util.tree_map(
                lambda d, s: jnp.asarray(np.asarray(s), np.asarray(d).dtype),
                state.g_params, src_tree,
            )
        )
        print(f"[vocoder] warm-started generator from {args.init_from}")
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"[vocoder] resumed from step {int(state.step)}")

    # data-parallel over the (data, model) mesh, exactly like cmd_acoustic:
    # generator weights per TP rules, discriminators + optimizer moments
    # replicated, batch sharded on the data axis
    from ..parallel import (
        batch_sharding,
        make_data_mesh,
        param_sharding_rules,
        replicate,
    )

    batch_size = config.train.batch_size // 2
    mesh = make_data_mesh(batch_size)
    data_sh = batch_sharding(mesh)
    state = state._replace(
        g_params=jax.device_put(
            state.g_params, param_sharding_rules(state.g_params, mesh)
        ),
        d_params=replicate(state.d_params, mesh),
        g_opt_state=replicate(state.g_opt_state, mesh),
        d_opt_state=replicate(state.d_opt_state, mesh),
        step=replicate(state.step, mesh),
    )

    mel_dir = "predicted_mels" if args.predicted_mels else "mels"
    dataset = VocoderDataset(
        train_entries, config,
        segment_size=config.audio.signal.segment_length // 4,
        mel_dir=mel_dir,
    )
    writer = ScalarWriter(os.path.join(args.workdir, "logs", f"vocoder_{kind}"))

    step = int(state.step)
    epoch = 0
    t0 = time.time()
    from ..utils.prefetch import prefetch_iterator

    with mesh:
        while step < args.steps:
            step_at_epoch_start = step
            for batch in prefetch_iterator(
                make_vocoder_batches(dataset, batch_size, seed=epoch),
                size=2,
            ):
                batch = jax.tree_util.tree_map(
                    lambda x: jax.device_put(jnp.asarray(x), data_sh), batch
                )
                state, metrics = step_fn(state, batch)
                step += 1  # host counter; see acoustic loop note
                if step % config.train.log_step == 0:
                    for k, v in metrics.items():
                        writer.scalar(f"vocoder/{k}", float(v), step)
                    print(
                        f"[vocoder] step {step} g={float(metrics['g_total']):.3f} "
                        f"d={float(metrics['d_total']):.3f} ({time.time() - t0:.0f}s)"
                    )
                if step % args.ckpt_every == 0:
                    ckpt.save(step, state)  # sharded arrays save per-shard
                if step >= args.steps:
                    break
            if step == step_at_epoch_start:
                # an epoch that yields zero batches would spin this loop at
                # 100% CPU forever (lived experience: a 7-utterance corpus
                # under the old tail-dropping batcher) — fail loudly instead
                raise RuntimeError(
                    "vocoder training epoch produced no batches "
                    f"({len(dataset)} utterances, batch_size {batch_size})"
                )
            epoch += 1
    ckpt.save(step, state, wait=True)
    print(f"[vocoder] done at step {step}")


def cmd_e2e(args):
    """Joint acoustic+vocoder GAN fine-tune (the combined loop the reference
    logged via e2e_logger but never shipped; train/e2e_step.py)."""
    from ..audio.wav import read_wav
    from ..config import default_config, load_config
    from ..data import AcousticDataset, make_acoustic_batches, split_train_valid
    from ..models import FastSpeech2, build_generator
    from ..nn import FeatureStats
    from ..train import acoustic_optimizer, gan_optimizer
    from ..train.checkpoint import CheckpointManager
    from ..train.e2e_step import E2EBatch, init_e2e_state, make_e2e_train_step
    from ..utils.logging import E2ELogger

    config = load_config(args.config) if args.config else default_config()
    if getattr(args, "supervised", False):
        config = _apply_supervised(config)
    entries, stats, speakers = _load_workdir(args.workdir)
    train_entries, _ = split_train_valid(entries, seed=config.train.seed)
    n_symbols, symbol_table = _lang_symbols(args.lang)
    dataset = AcousticDataset(
        train_entries, speakers, stats, config,
        supervised=getattr(args, "supervised", False),
        prior_cache_dir=os.path.join(args.workdir, "priors"),
        symbol_table=symbol_table,
    )
    wav_by_path = {}  # bounded below: cleared past _WAV_CACHE_MAX entries

    model = FastSpeech2(
        config=config.models.fastspeech2,
        n_symbols=n_symbols,
        n_speakers=len(speakers),
        n_mel_channels=config.audio.mel.channels,
        stats=FeatureStats.from_dict(stats),
    )
    gen = build_generator(config, "hifigan")
    am_opt = acoustic_optimizer(
        config.train.fastspeech2_optimizer, config.models.fastspeech2.encoder_hidden
    )
    # fine-tune conditioning (VERDICT r2 item 2): scale down the acoustic
    # LR (the Noam schedule restarts at step 0, so an unscaled fine-tune
    # soon runs at PEAK LR over trained weights) and optionally the
    # discriminator LR; the adversarial weight ramps via --adv-warmup
    # the UNSCALED optimizers keep the per-stage checkpoints' opt-state
    # structure for the restore templates below; the e2e optimizers are
    # ALWAYS chained with a scale so the e2e checkpoint structure does not
    # depend on the CLI flags (export rebuilds the same template via
    # e2e_optimizers)
    am_opt_base = am_opt
    d_opt_base = gan_optimizer(config.train.hifigan_optimizer)
    am_opt, g_opt, d_opt = e2e_optimizers(
        config,
        am_scale=getattr(args, "am_lr_scale", 1.0),
        d_scale=getattr(args, "d_lr_scale", 1.0),
    )
    n_words = max(config.models.fastspeech2.max_seq_len, 256)
    step_fn = jax.jit(
        make_e2e_train_step(
            model, gen, config, am_opt, g_opt, d_opt, n_words,
            adv_warmup_steps=getattr(args, "adv_warmup", 0),
        )
    )
    state = init_e2e_state(
        model, gen, config, am_opt, g_opt, d_opt, jax.random.PRNGKey(config.train.seed)
    )
    ckpt = CheckpointManager(os.path.join(args.workdir, "e2e_ckpt"))
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"[e2e] resumed from step {int(state.step)}")
    elif getattr(args, "init_from", None):
        # seed the joint fine-tune from a deploy bundle
        from flax import serialization

        state = state._replace(
            acoustic_params=warm_start_params(
                state.acoustic_params, args.init_from
            )
        )
        with open(os.path.join(args.init_from, "vocoder.msgpack"), "rb") as f:
            vsrc = serialization.msgpack_restore(f.read())
        state = state._replace(
            g_params=jax.tree_util.tree_map(
                lambda d, s: jnp.asarray(np.asarray(s), np.asarray(d).dtype),
                state.g_params, vsrc,
            )
        )
        print(f"[e2e] warm-started from bundle {args.init_from}")
    else:
        # a joint GAN fine-tune continues the separately-trained stages:
        # pick up the workdir's acoustic + vocoder checkpoints when present
        from ..train import init_train_state, init_vocoder_train_state

        ack = CheckpointManager(os.path.join(args.workdir, "acoustic_ckpt"))
        if ack.latest_step() is not None:
            a_st = ack.restore(
                init_train_state(model, am_opt_base, jax.random.PRNGKey(0))
            )
            state = state._replace(
                acoustic_params=a_st.params,
                acoustic_batch_stats=a_st.batch_stats,
            )
            print(f"[e2e] acoustic seeded from step {int(a_st.step)}")
        ack.close()
        vck = CheckpointManager(
            os.path.join(args.workdir, "vocoder_hifigan_ckpt")
        )
        if vck.latest_step() is not None:
            v_st = vck.restore(
                init_vocoder_train_state(
                    gen, config, g_opt, d_opt_base, jax.random.PRNGKey(0)
                )
            )
            state = state._replace(
                g_params=v_st.g_params, d_params=v_st.d_params
            )
            print(f"[e2e] vocoder seeded from step {int(v_st.step)}")
        vck.close()

    # data-parallel over the mesh: acoustic + generator weights per TP
    # rules, discriminators/optimizer moments/batch stats replicated
    from ..parallel import (
        batch_sharding,
        make_data_mesh,
        param_sharding_rules,
        replicate,
    )

    mesh = make_data_mesh(config.train.batch_size)
    data_sh = batch_sharding(mesh)
    state = state._replace(
        acoustic_params=jax.device_put(
            state.acoustic_params,
            param_sharding_rules(state.acoustic_params, mesh),
        ),
        acoustic_batch_stats=replicate(state.acoustic_batch_stats, mesh),
        g_params=jax.device_put(
            state.g_params, param_sharding_rules(state.g_params, mesh)
        ),
        d_params=replicate(state.d_params, mesh),
        am_opt_state=replicate(state.am_opt_state, mesh),
        g_opt_state=replicate(state.g_opt_state, mesh),
        d_opt_state=replicate(state.d_opt_state, mesh),
        step=replicate(state.step, mesh),
    )

    logger = E2ELogger(os.path.join(args.workdir, "logs", "e2e"))
    hop = config.audio.stft.hop_length
    rng = jax.random.PRNGKey(config.train.seed)
    step = int(state.step)
    epoch = 0
    t0 = time.time()
    from ..utils.prefetch import prefetch_iterator

    def host_batches(ep):
        """Host-side assembly (feature loads, padding, wav gather) — runs in
        the prefetch worker thread so it overlaps the device step, like the
        acoustic/vocoder loops."""
        for batch, paths in make_acoustic_batches(
            dataset, config.train.batch_size, seed=config.train.seed + ep,
            with_paths=True,
        ):
            T = batch.mel.shape[1]
            audio = np.zeros((batch.mel.shape[0], T * hop), np.float32)
            for row, p in enumerate(paths):
                if p not in wav_by_path:
                    if len(wav_by_path) >= 2048:
                        # bound host RAM on large corpora; reloads overlap
                        # the device step via the prefetch worker anyway
                        wav_by_path.clear()
                    wav_by_path[p], _ = read_wav(p)
                w = wav_by_path[p][: T * hop]
                audio[row, : len(w)] = w
            yield batch, audio

    with mesh:
        while step < args.steps:
            for batch, audio in prefetch_iterator(host_batches(epoch)):
                eb = E2EBatch(
                    acoustic=jax.tree_util.tree_map(jnp.asarray, batch),
                    audio=jnp.asarray(audio),
                )
                eb = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, data_sh), eb
                )
                rng, sub = jax.random.split(rng)
                state, metrics = step_fn(state, eb, sub)
                step += 1  # host counter; see acoustic loop note
                if step % config.train.log_step == 0:
                    logger.log(step, {k: float(v) for k, v in metrics.items()})
                    print(
                        f"[e2e] step {step} total={float(metrics['total']):.3f} "
                        f"d={float(metrics['discriminator']):.3f} ({time.time() - t0:.0f}s)"
                    )
                if step % args.ckpt_every == 0:
                    ckpt.save(step, state)  # sharded arrays save per-shard
                if step >= args.steps:
                    break
            epoch += 1
    ckpt.save(step, state, wait=True)
    print(f"[e2e] done at step {step}")


def cmd_generate_mels(args):
    """Batch acoustic inference with teacher-forced durations -> write
    ``predicted_mels/*.npy`` for vocoder fine-tuning (reference
    generate_mel, tools_for_data.py:216-256)."""
    from ..config import default_config, load_config
    from ..data import AcousticDataset, make_acoustic_batches
    from ..models import FastSpeech2
    from ..nn import FeatureStats
    from ..train import acoustic_optimizer, init_train_state
    from ..train.checkpoint import CheckpointManager

    config = load_config(args.config) if args.config else default_config()
    if getattr(args, "supervised", False):
        config = _apply_supervised(config)
    entries, stats, speakers = _load_workdir(args.workdir)
    n_symbols, symbol_table = _lang_symbols(args.lang)
    dataset = AcousticDataset(
        entries, speakers, stats, config,
        supervised=getattr(args, "supervised", False),
        prior_cache_dir=os.path.join(args.workdir, "priors"),
        symbol_table=symbol_table,
    )
    model = FastSpeech2(
        config=config.models.fastspeech2,
        n_symbols=n_symbols,
        n_speakers=len(speakers),
        n_mel_channels=config.audio.mel.channels,
        stats=FeatureStats.from_dict(stats),
    )
    optimizer = acoustic_optimizer(
        config.train.fastspeech2_optimizer, config.models.fastspeech2.encoder_hidden
    )
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(os.path.join(args.workdir, "acoustic_ckpt"))
    if ckpt.latest_step() is None:
        raise SystemExit(
            f"[generate-mels] no acoustic checkpoint in "
            f"{args.workdir}/acoustic_ckpt"
        )
    state = ckpt.restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def infer(variables, batch):
        # teacher-forced forward (training graph, eval weights) reproduces
        # target-aligned mels for the vocoder
        fs2v = config.models.fastspeech2.variance
        kw = dict(
            speakers=batch.speakers,
            texts=batch.texts,
            txt_lens=batch.txt_lens,
            max_mel_len=batch.mel.shape[1],
            mel=batch.mel,
            mel_lens=batch.mel_lens,
            energy_target=batch.energy,
            step=jnp.asarray(10**9),
            train=True,
        )
        # honor the same config switches cmd_e2e's step does
        # (e2e_step.py:96-103): uv-conditioned vs plain pitch, learned
        # aligner vs supervised durations
        if fs2v.variance_embedding.use_uv:
            kw["pitch_target"] = {"f0": batch.f0, "uv": batch.uv}
        else:
            kw["pitch_target"] = batch.pitch
        if fs2v.duration_modelling.learn_alignment:
            kw["attn_prior"] = batch.attn_prior
        else:
            kw["duration_target"] = batch.duration_target
        out, _ = model.apply(
            variables, **kw,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        return out["postnet_mel"], out["mel_lens"]

    count = 0
    for batch, paths in make_acoustic_batches(
        dataset, config.train.batch_size, shuffle=False, with_paths=True
    ):
        b = jax.tree_util.tree_map(jnp.asarray, batch)
        mels, lens = infer(variables, b)
        mels, lens = np.asarray(mels), np.asarray(lens)
        for row, wav in enumerate(paths):
            base = os.path.splitext(os.path.basename(wav))[0]
            root = os.path.dirname(os.path.dirname(wav))
            outdir = os.path.join(root, "predicted_mels")
            os.makedirs(outdir, exist_ok=True)
            np.save(
                os.path.join(outdir, f"{base}.npy"),
                mels[row, : lens[row]].T,  # (n_mels, T) reference layout
            )
            count += 1
    print(f"[generate-mels] wrote {count} predicted mels")


def cmd_export(args):
    """Write the serving bundle from trained checkpoints."""
    from ..config import default_config, load_config
    from ..models import FastSpeech2, build_generator
    from ..nn import FeatureStats
    from ..serve.bundle import save_bundle
    from ..train import (
        acoustic_optimizer,
        gan_optimizer,
        init_train_state,
        init_vocoder_train_state,
    )
    from ..train.checkpoint import CheckpointManager

    config = load_config(args.config) if args.config else default_config()
    if getattr(args, "supervised", False):
        config = _apply_supervised(config)
    entries, stats, speakers = _load_workdir(args.workdir)

    from ..nn.variance import FeatureStats as FS

    n_symbols, _ = _lang_symbols(args.lang)
    model = FastSpeech2(
        config=config.models.fastspeech2,
        n_symbols=n_symbols,
        n_speakers=len(speakers),
        n_mel_channels=config.audio.mel.channels,
        stats=FS.from_dict(stats),
    )
    optimizer = acoustic_optimizer(
        config.train.fastspeech2_optimizer, config.models.fastspeech2.encoder_hidden
    )
    a_state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    a_ckpt = CheckpointManager(os.path.join(args.workdir, "acoustic_ckpt"))
    if a_ckpt.latest_step() is None:
        raise SystemExit(
            f"[export] no acoustic checkpoint in {args.workdir}/acoustic_ckpt"
            " — exporting would write RANDOM weights"
        )
    a_state = a_ckpt.restore(a_state)

    kind = "istft" if args.istft else "hifigan"
    gen = build_generator(config, kind)
    g_opt = gan_optimizer(config.train.hifigan_optimizer)
    v_state = init_vocoder_train_state(gen, config, g_opt, g_opt, jax.random.PRNGKey(0))
    v_ckpt = CheckpointManager(os.path.join(args.workdir, f"vocoder_{kind}_ckpt"))
    if v_ckpt.latest_step() is None:
        raise SystemExit(
            f"[export] no vocoder checkpoint in "
            f"{args.workdir}/vocoder_{kind}_ckpt"
            " — exporting would write RANDOM weights"
        )
    v_state = v_ckpt.restore(v_state)

    acoustic_vars = {"params": a_state.params, "batch_stats": a_state.batch_stats}
    g_params = v_state.g_params

    # a joint e2e fine-tune supersedes the per-stage checkpoints (hifigan
    # only — the e2e loop trains that kind); --no-e2e exports the stages
    e2e_dir = os.path.join(args.workdir, "e2e_ckpt")
    if kind == "hifigan" and not args.no_e2e and os.path.isdir(e2e_dir):
        from ..train.e2e_step import init_e2e_state

        e_ckpt = CheckpointManager(e2e_dir)
        if e_ckpt.latest_step() is not None:
            am_e, g_e, d_e = e2e_optimizers(config)
            e_state = e_ckpt.restore(
                init_e2e_state(
                    model, gen, config, am_e, g_e, d_e,
                    jax.random.PRNGKey(0),
                )
            )
            acoustic_vars = {
                "params": e_state.acoustic_params,
                "batch_stats": e_state.acoustic_batch_stats,
            }
            g_params = e_state.g_params
            print(
                f"[export] using e2e fine-tune step {int(e_state.step)} "
                "(pass --no-e2e for the per-stage checkpoints)"
            )
        e_ckpt.close()

    from ..models.vocoder import fuse_weight_norm

    save_bundle(
        args.output,
        config,
        acoustic_vars,
        fuse_weight_norm(g_params),
        speakers,
        FS.from_dict(stats),
        kind,
        language=args.lang,
    )
    print(f"[export] bundle -> {args.output}")


def main(argv=None):
    from ..utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()  # repeat CLI runs skip XLA recompiles

    p = argparse.ArgumentParser(prog="train.py")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("prepare")
    pp.add_argument("--corpus", nargs="+", required=True)
    pp.add_argument("--workdir", required=True)
    pp.add_argument("--config")
    pp.add_argument("--lang", default="vie", choices=["vie", "eng", "mya"])
    pp.add_argument("--supervised", action="store_true")
    pp.add_argument("--overwrite", action="store_true")
    pp.set_defaults(fn=cmd_prepare)

    pa = sub.add_parser("acoustic")
    pa.add_argument("--workdir", required=True)
    pa.add_argument("--config")
    pa.add_argument("--lang", default="vie", choices=["vie", "eng", "mya"])
    pa.add_argument("--steps", type=int, default=600000)
    pa.add_argument("--ckpt-every", type=int, default=5000)
    pa.add_argument("--supervised", action="store_true")
    pa.add_argument(
        "--init-from", dest="init_from",
        help="warm-start from a deploy bundle (fine-tune on a new voice)",
    )
    pa.set_defaults(fn=cmd_acoustic)

    pv = sub.add_parser("vocoder")
    pv.add_argument("--workdir", required=True)
    pv.add_argument("--config")
    pv.add_argument("--steps", type=int, default=400000)
    pv.add_argument("--ckpt-every", type=int, default=5000)
    pv.add_argument("--istft", action="store_true")
    pv.add_argument(
        "--init-from", dest="init_from",
        help="warm-start the generator from a deploy bundle",
    )
    pv.add_argument("--predicted-mels", action="store_true")
    pv.set_defaults(fn=cmd_vocoder)

    pj = sub.add_parser("e2e")
    pj.add_argument("--workdir", required=True)
    pj.add_argument("--config")
    pj.add_argument("--supervised", action="store_true")
    pj.add_argument("--lang", default="vie", choices=["vie", "eng", "mya"])
    pj.add_argument("--steps", type=int, default=100000)
    pj.add_argument("--ckpt-every", type=int, default=5000)
    pj.add_argument(
        "--init-from", dest="init_from",
        help="warm-start acoustic+vocoder from a deploy bundle",
    )
    pj.add_argument(
        "--adv-warmup", dest="adv_warmup", type=int, default=0,
        help="ramp adversarial+fm weight 0->1 over N steps",
    )
    pj.add_argument(
        "--am-lr-scale", dest="am_lr_scale", type=float, default=1.0,
        help="scale on the acoustic Noam LR for fine-tuning",
    )
    pj.add_argument(
        "--d-lr-scale", dest="d_lr_scale", type=float, default=1.0,
        help="scale on the discriminator LR",
    )
    pj.set_defaults(fn=cmd_e2e)

    pg = sub.add_parser("generate-mels")
    pg.add_argument("--workdir", required=True)
    pg.add_argument("--config")
    pg.add_argument("--supervised", action="store_true")
    pg.add_argument("--lang", default="vie", choices=["vie", "eng", "mya"])
    pg.set_defaults(fn=cmd_generate_mels)

    pe = sub.add_parser("export")
    pe.add_argument("--workdir", required=True)
    pe.add_argument("--output", required=True)
    pe.add_argument("--config")
    pe.add_argument("--supervised", action="store_true")
    pe.add_argument("--lang", default="vie", choices=["vie", "eng", "mya"])
    pe.add_argument("--istft", action="store_true")
    pe.add_argument(
        "--no-e2e", action="store_true",
        help="ignore an e2e fine-tune checkpoint; export the raw stages",
    )
    pe.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
