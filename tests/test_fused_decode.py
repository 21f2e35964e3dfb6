"""Parity tests for the fused whole-step decode kernel (ops/fused_decode.py).

The XLA cached decode path (models/roberta.py decode_step) is the numerical
spec — itself oracle-pinned against the reference torch model in
tests/test_reference_oracle.py. The fused kernel (interpret mode on CPU) must
reproduce its step logits, cache column writes, and end-to-end beam-search
output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prismer_tpu.config import PrismerConfig, TextDecoderConfig
from prismer_tpu.models import roberta as rb
from prismer_tpu.models.roberta import RobertaCausalDecoder

B, K, P, T, L_ENC, DV = 2, 3, 4, 12, 40, 48
N = B * K


def decoder_cfg():
    return TextDecoderConfig(
        vocab_size=128, hidden_size=64, vision_hidden_size=DV,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


@pytest.fixture(autouse=True)
def _reset_fused_mode():
    yield
    rb.set_fused_decode("auto")


def _setup(dtype):
    rng = np.random.default_rng(0)
    cfg = decoder_cfg()
    dec = RobertaCausalDecoder(cfg, dtype=dtype)
    ids = jnp.asarray(rng.integers(4, 120, (B, P)).astype(np.int32))
    mask = jnp.ones((B, P), jnp.int32)
    variables = dec.init(jax.random.key(0), ids, mask,
                         jnp.ones((B, L_ENC, DV)))
    enc = jnp.asarray(rng.standard_normal((B, L_ENC, DV)).astype(np.float32))
    # right-padded prompt with an interior pad hole on sample 1 exercises the
    # cached-column mask bias
    prompt_mask = np.ones((B, P), np.int32)
    prompt_mask[1, 2] = 0
    prompt_mask = jnp.asarray(prompt_mask)
    ids_tiled = jnp.repeat(ids, K, axis=0)
    mask_tiled = jnp.repeat(prompt_mask, K, axis=0)
    return cfg, dec, variables, enc, ids_tiled, mask_tiled, prompt_mask


def _run_steps(dec, variables, enc, ids_tiled, mask_tiled, prompt_mask,
               n_steps=4, seed=7):
    """init_cache + n_steps decode steps with deterministic tokens; returns
    (per-step logits list, final cache)."""
    rng = np.random.default_rng(seed)
    logits0, cache = dec.apply(variables, ids_tiled, mask_tiled, enc, T, K,
                               method=RobertaCausalDecoder.init_cache)
    outs = [logits0]
    prompt_nonpad = jnp.sum(prompt_mask, axis=1).astype(jnp.int32)
    for s in range(n_steps):
        index = jnp.asarray(P + s, jnp.int32)
        tokens = jnp.asarray(rng.integers(4, 120, (N,)).astype(np.int32))
        pos = (prompt_nonpad[:, None] + s + 1 + 1)
        pos = jnp.broadcast_to(pos, (B, K)).reshape(-1)
        positions = jnp.arange(T)[None, :]
        key_mask_b = jnp.where(
            positions < P, jnp.pad(prompt_mask, ((0, 0), (0, T - P))),
            (positions <= index).astype(prompt_mask.dtype))
        key_mask = jnp.repeat(key_mask_b, K, axis=0)
        step_logits, cache = dec.apply(
            variables, tokens, index, pos, key_mask, cache, K, L_ENC,
            method=RobertaCausalDecoder.decode_step)
        outs.append(step_logits)
    return outs, cache


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-4),
                                        (jnp.bfloat16, 0.15)])
def test_fused_step_matches_xla(dtype, atol):
    cfg, dec, variables, enc, ids_tiled, mask_tiled, prompt_mask = _setup(dtype)
    rb.set_fused_decode("off")
    ref, cache_x = _run_steps(dec, variables, enc, ids_tiled, mask_tiled,
                              prompt_mask)
    rb.set_fused_decode("on")
    got, cache_f = _run_steps(dec, variables, enc, ids_tiled, mask_tiled,
                              prompt_mask)
    assert "w_head" in cache_f and "self_k_tn" in cache_f
    for s, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            atol=atol, rtol=atol, err_msg=f"step {s}")

    # cache column writes: fused (NL, T, N, D) vs XLA kt (NL, N, H, Dh, T)
    h, dh = cfg.num_attention_heads, cfg.head_dim
    for s in range(4):
        col = P + s
        k_x = np.asarray(cache_x["self_kt"][:, :, :, :, col],
                         np.float32)                     # (NL, N, H, Dh)
        k_f = np.asarray(cache_f["self_k_tn"][:, col],
                         np.float32).reshape(k_x.shape[0], N, h, dh)
        np.testing.assert_allclose(k_f, k_x, atol=atol, rtol=atol)
        v_x = np.asarray(cache_x["self_v"][:, :, :, col], np.float32)
        v_f = np.asarray(cache_f["self_v_tn"][:, col],
                         np.float32).reshape(v_x.shape[0], N, h, dh)
        np.testing.assert_allclose(v_f, v_x, atol=atol, rtol=atol)


def test_fused_beam_search_end_to_end():
    """Full beam_search with the fused path produces the same sequences and
    scores as the XLA path (fp32 tiny model)."""
    from prismer_tpu.models.generation import beam_search
    from prismer_tpu.models.prismer import Prismer
    from tests.test_models import make_expert_inputs, tiny_vision

    import dataclasses

    rng = np.random.default_rng(1)
    vis = tiny_vision()
    # vision width (64) != DV: decoder cross-attn projects from 64 here
    dec_cfg = dataclasses.replace(decoder_cfg(), vision_hidden_size=64)
    cfg = PrismerConfig(vision=vis, decoder=dec_cfg,
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 120, (2, 4)).astype(np.int32))
    mask = jnp.ones((2, 4), jnp.int32)
    variables = model.init(jax.random.key(0), inputs, ids, mask)
    enc = model.apply(variables, inputs, method=Prismer.encode)

    def make_run(mode):
        # a FRESH function object per mode: jax's tracing cache is keyed on
        # function identity, so re-jitting the same function after flipping
        # the module flag would silently reuse the first trace (verified)
        rb.set_fused_decode(mode)

        def run():
            return beam_search(
                model, variables, enc, ids, mask, num_beams=3, max_length=12,
                min_length=6, length_penalty=1.0,
                eos_token_id=cfg.decoder.eos_token_id,
                pad_token_id=cfg.decoder.pad_token_id)
        return jax.jit(run)

    seq_x, sc_x = make_run("off")()

    # prove the fused trace actually reaches the kernel (guards against the
    # function-identity retrace hazard this test once fell into)
    import prismer_tpu.ops.fused_decode as fd
    calls = []
    orig = fd.fused_decode_step

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    fd.fused_decode_step = counting
    try:
        seq_f, sc_f = make_run("on")()
    finally:
        fd.fused_decode_step = orig
    assert calls, "fused path was never traced"
    np.testing.assert_array_equal(np.asarray(seq_f), np.asarray(seq_x))
    np.testing.assert_allclose(np.asarray(sc_f), np.asarray(sc_x), atol=1e-4)


def test_prepacked_collection_matches_in_graph_packing():
    """A precomputed `packed_decode` collection (serving setup,
    models/roberta.py pack_decode_collection) is bit-identical to the
    in-graph packing _fused_cache falls back to — same computation, hoisted
    out of the jitted generate call."""
    dtype = jnp.bfloat16
    cfg, dec, variables, enc, ids_tiled, mask_tiled, prompt_mask = _setup(dtype)
    rb.set_fused_decode("on")
    ref, cache_r = _run_steps(dec, variables, enc, ids_tiled, mask_tiled,
                              prompt_mask)
    packed = rb.pack_decode_collection(variables["params"], cfg, dtype)
    variables2 = dict(variables)
    variables2["packed_decode"] = packed
    got, cache_g = _run_steps(dec, variables2, enc, ids_tiled, mask_tiled,
                              prompt_mask)
    for s, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=f"step {s}")
    for k in ("w_head", "w_tail", "b_all"):
        np.testing.assert_array_equal(np.asarray(cache_g[k]),
                                      np.asarray(cache_r[k]))


def test_prepare_serving_variables_end_to_end():
    """Prismer-level serving setup: prepare_serving_variables nests the
    collection under text_decoder and beam_search output is unchanged."""
    from prismer_tpu.models.generation import beam_search
    from prismer_tpu.models.prismer import Prismer, prepare_serving_variables
    from tests.test_models import make_expert_inputs, tiny_vision

    import dataclasses

    rng = np.random.default_rng(3)
    vis = tiny_vision()
    dec_cfg = dataclasses.replace(decoder_cfg(), vision_hidden_size=64)
    cfg = PrismerConfig(vision=vis, decoder=dec_cfg,
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 120, (2, 4)).astype(np.int32))
    mask = jnp.ones((2, 4), jnp.int32)
    variables = model.init(jax.random.key(0), inputs, ids, mask)
    enc = model.apply(variables, inputs, method=Prismer.encode)

    rb.set_fused_decode("on")

    def run(vs):
        return beam_search(
            model, vs, enc, ids, mask, num_beams=3, max_length=12,
            min_length=6, length_penalty=1.0,
            eos_token_id=cfg.decoder.eos_token_id,
            pad_token_id=cfg.decoder.pad_token_id)

    seq_plain, sc_plain = jax.jit(run)(variables)
    vs2 = prepare_serving_variables(model, variables)
    assert "packed_decode" in vs2 and "text_decoder" in vs2["packed_decode"]

    def run2(vs):  # fresh function object: jax trace cache is identity-keyed
        return beam_search(
            model, vs, enc, ids, mask, num_beams=3, max_length=12,
            min_length=6, length_penalty=1.0,
            eos_token_id=cfg.decoder.eos_token_id,
            pad_token_id=cfg.decoder.pad_token_id)

    seq_packed, sc_packed = jax.jit(run2)(vs2)
    np.testing.assert_array_equal(np.asarray(seq_packed),
                                  np.asarray(seq_plain))
    np.testing.assert_allclose(np.asarray(sc_packed), np.asarray(sc_plain),
                               atol=1e-6)


def _quant_dequant_cache(cache):
    """Quantize-dequantize the XLA cache's cross K/V with the kernel's exact
    per-(layer, sample, head) scheme (ops/fused_decode.quantize_kv) — the
    reference numerics for the int8 fused path."""
    from prismer_tpu.ops.fused_decode import quantize_kv
    ckt = cache["cross_kt"]                    # (NLc, B, H, Dh, L)
    cv = cache["cross_v"]                      # (NLc, B, H, L, Dh)
    new_kt, new_v = [], []
    for l in range(ckt.shape[0]):
        ck = ckt[l].transpose(0, 1, 3, 2)      # (B, H, L, Dh)
        ki, ks = quantize_kv(ck)
        ck_dq = ki.astype(jnp.float32) * ks[:, :, None, None]
        new_kt.append(ck_dq.transpose(0, 1, 3, 2))
        vi, vs = quantize_kv(cv[l])
        new_v.append(vi.astype(jnp.float32) * vs[:, :, None, None])
    return dict(cache, cross_kt=jnp.stack(new_kt).astype(ckt.dtype),
                cross_v=jnp.stack(new_v).astype(cv.dtype))


def _run_steps_cache_hook(dec, variables, enc, ids_tiled, mask_tiled,
                          prompt_mask, cache_hook, n_steps=4, seed=7):
    """_run_steps with a post-init_cache hook over the cache pytree."""
    rng = np.random.default_rng(seed)
    logits0, cache = dec.apply(variables, ids_tiled, mask_tiled, enc, T, K,
                               method=RobertaCausalDecoder.init_cache)
    cache = cache_hook(cache)
    outs = [logits0]
    prompt_nonpad = jnp.sum(prompt_mask, axis=1).astype(jnp.int32)
    for s in range(n_steps):
        index = jnp.asarray(P + s, jnp.int32)
        tokens = jnp.asarray(rng.integers(4, 120, (N,)).astype(np.int32))
        pos = (prompt_nonpad[:, None] + s + 1 + 1)
        pos = jnp.broadcast_to(pos, (B, K)).reshape(-1)
        positions = jnp.arange(T)[None, :]
        key_mask_b = jnp.where(
            positions < P, jnp.pad(prompt_mask, ((0, 0), (0, T - P))),
            (positions <= index).astype(prompt_mask.dtype))
        key_mask = jnp.repeat(key_mask_b, K, axis=0)
        step_logits, cache = dec.apply(
            variables, tokens, index, pos, key_mask, cache, K, L_ENC,
            method=RobertaCausalDecoder.decode_step)
        outs.append(step_logits)
    return outs, cache


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 3e-4),
                                        (jnp.bfloat16, 0.15)])
def test_kv_quant_matches_dequantized_xla(dtype, atol):
    """int8 cross-KV fused decode == the XLA path run on quantize-dequantized
    cross K/V (isolates kernel correctness from the quantization error, which
    is part of the mode's spec)."""
    cfg, dec, variables, enc, ids_tiled, mask_tiled, prompt_mask = _setup(dtype)
    rb.set_fused_decode("off")
    ref, _ = _run_steps_cache_hook(dec, variables, enc, ids_tiled,
                                   mask_tiled, prompt_mask,
                                   _quant_dequant_cache)
    rb.set_fused_decode("on")
    rb.set_kv_quant("int8")
    try:
        got, cache_f = _run_steps(dec, variables, enc, ids_tiled, mask_tiled,
                                  prompt_mask)
    finally:
        rb.set_kv_quant("off")
    assert cache_f["cross_kd"].dtype == jnp.int8
    assert cache_f["cross_vc"].dtype == jnp.int8
    assert cache_f["cross_ks"].shape == (cfg.num_hidden_layers, B, 1, 128)
    for s, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            atol=atol, rtol=atol, err_msg=f"step {s}")


def test_kv_quant_beam_search_smoke():
    """End-to-end beam search in int8-KV mode: runs, finite scores, valid
    token ids (sequence-level agreement with bf16 is not guaranteed by the
    mode's spec — quantization error can flip near-ties)."""
    from prismer_tpu.models.generation import beam_search
    from prismer_tpu.models.prismer import Prismer
    from tests.test_models import make_expert_inputs, tiny_vision

    import dataclasses

    rng = np.random.default_rng(5)
    vis = tiny_vision()
    dec_cfg = dataclasses.replace(decoder_cfg(), vision_hidden_size=64)
    cfg = PrismerConfig(vision=vis, decoder=dec_cfg,
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 120, (2, 4)).astype(np.int32))
    mask = jnp.ones((2, 4), jnp.int32)
    variables = model.init(jax.random.key(0), inputs, ids, mask)
    enc = model.apply(variables, inputs, method=Prismer.encode)

    rb.set_fused_decode("on")
    rb.set_kv_quant("int8")
    try:
        def run():
            return beam_search(
                model, variables, enc, ids, mask, num_beams=3, max_length=12,
                min_length=6, length_penalty=1.0,
                eos_token_id=cfg.decoder.eos_token_id,
                pad_token_id=cfg.decoder.pad_token_id)
        seqs, scores = jax.jit(run)()
    finally:
        rb.set_kv_quant("off")
    assert seqs.shape == (2, 12)
    assert np.isfinite(np.asarray(scores)).all()
    assert (np.asarray(seqs) >= 0).all()
    assert (np.asarray(seqs) < 128).all()


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_perm_fold_matches_outside_permute(dtype):
    """fused_decode_step(flat_beam=...) — the in-kernel beam-reorder fold —
    is BIT-IDENTICAL to permuting the self caches outside and running the
    plain fused step: the fold applies the same 0/1 selector to the same
    rows, just while the tiles are already in VMEM."""
    cfg, dec, variables, enc, ids_tiled, mask_tiled, prompt_mask = \
        _setup(dtype)
    rb.set_fused_decode("on")
    _, cache = dec.apply(variables, ids_tiled, mask_tiled, enc, T, K,
                         method=RobertaCausalDecoder.init_cache)
    assert "self_k_tn" in cache

    rng = np.random.default_rng(11)
    beam = rng.integers(0, K, (B, K))
    flat_beam = jnp.asarray(
        (beam + np.arange(B)[:, None] * K).reshape(-1).astype(np.int32))
    index = jnp.asarray(P, jnp.int32)
    tokens = jnp.asarray(rng.integers(4, 120, (N,)).astype(np.int32))
    pos = jnp.full((N,), P + 2, jnp.int32)
    positions = jnp.arange(T)[None, :]
    key_mask_b = jnp.where(
        positions < P, jnp.pad(prompt_mask, ((0, 0), (0, T - P))),
        (positions <= index).astype(prompt_mask.dtype))
    key_mask = jnp.repeat(key_mask_b, K, axis=0)

    # path A: reorder outside (the gather impl), then a plain fused step
    cache_a = dict(cache,
                   self_k_tn=jnp.take(cache["self_k_tn"], flat_beam, axis=2),
                   self_v_tn=jnp.take(cache["self_v_tn"], flat_beam, axis=2))
    logits_a, cache_a = dec.apply(
        variables, tokens, index, pos, key_mask, cache_a, K, L_ENC,
        method=RobertaCausalDecoder.decode_step)

    # path B: unpermuted cache, reorder folded into the kernel
    logits_b, cache_b = dec.apply(
        variables, tokens, index, pos, key_mask, cache, K, L_ENC,
        perm=flat_beam, method=RobertaCausalDecoder.decode_step)

    np.testing.assert_array_equal(np.asarray(logits_b), np.asarray(logits_a))
    np.testing.assert_array_equal(np.asarray(cache_b["self_k_tn"]),
                                  np.asarray(cache_a["self_k_tn"]))
    np.testing.assert_array_equal(np.asarray(cache_b["self_v_tn"]),
                                  np.asarray(cache_a["self_v_tn"]))


def test_beam_search_kernel_perm_mode_end_to_end(monkeypatch):
    """PRISMER_BEAM_PERM=kernel beam search (reorder folded into the fused
    kernel) returns exactly the gather-mode sequences and scores."""
    from prismer_tpu.models import generation
    from prismer_tpu.models.generation import beam_search
    from prismer_tpu.models.prismer import Prismer
    from tests.test_models import make_expert_inputs, tiny_vision

    import dataclasses

    rng = np.random.default_rng(3)
    vis = tiny_vision()
    dec_cfg = dataclasses.replace(decoder_cfg(), vision_hidden_size=64)
    cfg = PrismerConfig(vision=vis, decoder=dec_cfg,
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 120, (2, 4)).astype(np.int32))
    mask = jnp.ones((2, 4), jnp.int32)
    variables = model.init(jax.random.key(0), inputs, ids, mask)
    enc = model.apply(variables, inputs, method=Prismer.encode)
    rb.set_fused_decode("on")

    def make_run():
        # fresh function object per mode (trace cache is identity-keyed)
        def run():
            return beam_search(
                model, variables, enc, ids, mask, num_beams=3, max_length=12,
                min_length=6, length_penalty=1.0,
                eos_token_id=cfg.decoder.eos_token_id,
                pad_token_id=cfg.decoder.pad_token_id)
        return jax.jit(run)

    monkeypatch.setattr(generation, "BEAM_PERM_IMPL", "gather")
    seq_g, sc_g = make_run()()
    monkeypatch.setattr(generation, "BEAM_PERM_IMPL", "kernel")
    seq_k, sc_k = make_run()()
    np.testing.assert_array_equal(np.asarray(seq_k), np.asarray(seq_g))
    np.testing.assert_array_equal(np.asarray(sc_k), np.asarray(sc_g))


def test_fused_rows_ok_alignment_gate():
    # Mosaic rejects 2nd-to-last-dim slices not 8-aligned (prismer_huge @ b4
    # -> N=12 crashed the fused kernel on chip); on TPU misaligned row counts
    # must route to the XLA decode path, while CPU interpret mode keeps
    # exercising the kernels at tiny test batches.
    assert rb.fused_rows_ok(24, backend="tpu")
    assert not rb.fused_rows_ok(12, backend="tpu")
    assert not rb.fused_rows_ok(6, backend="tpu")
    assert rb.fused_rows_ok(12, backend="cpu")
    assert rb.fused_rows_ok(6, backend="cpu")
    # current process default backend is CPU in tests -> always ok
    assert rb.fused_rows_ok(6)


def test_misaligned_batch_pads_to_fused_path(monkeypatch):
    """generation.beam_search pads the batch (copies of sample 0) when
    N = B*K is Mosaic-misaligned instead of falling back to the XLA decode
    path (the round-4 prismer_huge b4 perf cliff). Emulate the TPU alignment
    rule on CPU and check the padded fused run is exact vs the unpadded one.
    """
    from prismer_tpu.models import generation
    from prismer_tpu.models.generation import beam_search
    from prismer_tpu.models.prismer import Prismer
    from tests.test_models import make_expert_inputs, tiny_vision

    import dataclasses

    rng = np.random.default_rng(5)
    vis = tiny_vision()
    dec_cfg = dataclasses.replace(decoder_cfg(), vision_hidden_size=64)
    cfg = PrismerConfig(vision=vis, decoder=dec_cfg,
                        prismer_model="prismer_tiny", dtype="float32")
    model = Prismer(cfg)
    inputs = make_expert_inputs(rng, vis)
    ids = jnp.asarray(rng.integers(4, 120, (2, 4)).astype(np.int32))
    mask = jnp.ones((2, 4), jnp.int32)
    variables = model.init(jax.random.key(0), inputs, ids, mask)
    enc = model.apply(variables, inputs, method=Prismer.encode)
    rb.set_fused_decode("on")

    def make_run():
        def run():
            return beam_search(
                model, variables, enc, ids, mask, num_beams=3, max_length=12,
                min_length=6, length_penalty=1.0,
                eos_token_id=cfg.decoder.eos_token_id,
                pad_token_id=cfg.decoder.pad_token_id)
        return jax.jit(run)

    seq_ref, sc_ref = make_run()()  # N=6, CPU: no padding

    # emulate the TPU 8-alignment rule: B=2,K=3 -> N=6 misaligned -> the
    # wrapper must pad B to 8 (24 rows) and slice back
    seen = []
    real = rb.fused_rows_ok
    monkeypatch.setattr(
        rb, "fused_rows_ok",
        lambda n, backend=None: seen.append(n) or n % 8 == 0)
    try:
        seq_pad, sc_pad = make_run()()
    finally:
        monkeypatch.setattr(rb, "fused_rows_ok", real)
    assert 6 in seen and 24 in seen, seen  # wrapper fired and re-entered
    np.testing.assert_array_equal(np.asarray(seq_pad), np.asarray(seq_ref))
    np.testing.assert_allclose(np.asarray(sc_pad), np.asarray(sc_ref),
                               atol=1e-5)


def test_fused_dims_ok_lane_alignment_gate():
    # Mosaic slices packed memrefs in hidden_size lane units: non-128-
    # aligned model dims must route to the XLA path on TPU (a tiny-config
    # quick-mode run on chip crashed Mosaic once the batch padding routed
    # it into the kernels), while production dims and CPU interpret mode
    # pass.
    tiny = decoder_cfg()  # hidden 64 / intermediate 128
    assert rb.fused_dims_ok(tiny, backend="cpu")
    assert not rb.fused_dims_ok(tiny, backend="tpu")

    import dataclasses
    base_like = dataclasses.replace(tiny, hidden_size=768,
                                    intermediate_size=3072)
    assert rb.fused_dims_ok(base_like, backend="tpu")
    large_like = dataclasses.replace(tiny, hidden_size=1024,
                                     intermediate_size=4096)
    assert rb.fused_dims_ok(large_like, backend="tpu")
