"""Bit-parity of the fused beam-bookkeeping kernel (ops/beam_update.py)
against the XLA reference (generation.beam_bookkeeping), including NEG_INF
ties, done-sample freezes, min-length EOS candidates and negative length
penalties; plus end-to-end beam_search equality kernel vs xla."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import prismer_tpu.models.generation as gen
from prismer_tpu.models.generation import NEG_INF, beam_bookkeeping
from prismer_tpu.ops.beam_update import beam_update

EOS, PAD, V = 2, 1, 50


def _random_case(rng, b, k, t, index, lp, n_eos, n_neg, n_done):
    kk = 2 * k
    vals = rng.standard_normal((b, kk)).astype(np.float32) * 3.0
    # inject exact ties inside rows
    vals[:, 1] = vals[:, 0]
    if n_neg:
        flat = rng.choice(b * kk, size=n_neg, replace=False)
        vals.reshape(-1)[flat] = NEG_INF
    beam = rng.integers(0, k, size=(b, kk)).astype(np.int32)
    tok = rng.integers(3, V, size=(b, kk)).astype(np.int32)
    if n_eos:
        flat = rng.choice(b * kk, size=n_eos, replace=False)
        tok.reshape(-1)[flat] = EOS
    alive_seqs = rng.integers(0, V, size=(b, k, t)).astype(np.int32)
    fin_seqs = rng.integers(0, V, size=(b, k, t)).astype(np.int32)
    alive_scores = rng.standard_normal((b, k)).astype(np.float32)
    fin_scores = rng.standard_normal((b, k)).astype(np.float32) - 1.0
    # some finished slots still empty (exact NEG_INF, ties with masked cands)
    fin_scores[:, -1] = NEG_INF
    if n_done:  # force the done rule true for the first n_done samples
        fin_scores[:n_done, :] = 100.0
    pen = np.float32(float(index) ** lp)
    return (jnp.asarray(vals), jnp.asarray(beam), jnp.asarray(tok),
            jnp.asarray(alive_seqs), jnp.asarray(alive_scores),
            jnp.asarray(fin_seqs), jnp.asarray(fin_scores),
            jnp.asarray(index, jnp.int32), jnp.asarray(pen))


@pytest.mark.parametrize("b,k,t,lp,n_eos,n_neg,n_done", [
    (2, 3, 12, 1.0, 3, 2, 0),
    (4, 2, 10, -1.0, 5, 4, 1),
    (3, 4, 16, 2.0, 8, 6, 2),
    (8, 3, 20, 1.0, 0, 0, 0),    # no EOS candidates at all
    (2, 2, 8, 1.0, 8, 0, 2),     # everything EOS, all done
])
def test_beam_update_matches_xla(b, k, t, lp, n_eos, n_neg, n_done):
    rng = np.random.default_rng(b * 100 + k * 10 + int(lp * 2) + n_eos)
    index = t // 2
    case = _random_case(rng, b, k, t, index, lp, n_eos, n_neg, n_done)
    (vals, beam, tok, aseq, ascore, fseq, fscore, idx, pen) = case

    want = beam_bookkeeping(vals, beam, tok, aseq, ascore, fseq, fscore,
                            idx, pen, eos_token_id=EOS, pad_token_id=PAD)
    got = beam_update(vals, beam, tok, aseq.reshape(b * k, t), ascore,
                      fseq.reshape(b * k, t), fscore, idx, pen,
                      eos_token_id=EOS, pad_token_id=PAD, interpret=True)
    names = ["alive_seqs", "alive_scores", "fin_seqs", "fin_scores",
             "tokens", "flat_beam"]
    want = (want[0].reshape(b * k, t), want[1], want[2].reshape(b * k, t),
            want[3], want[4], want[5])
    for nm, w, g in zip(names, want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=nm)


def test_beam_search_end_to_end_kernel_vs_xla():
    # run the two impls through beam_search with a stub model and compare
    b, k, t, p, v = 2, 3, 9, 3, 32
    rng = np.random.default_rng(0)

    class StubModel:
        """Minimal Prismer.decode surface: logits depend on the running
        state so bookkeeping differences would change trajectories."""

        def apply(self, variables, *args, method=None, **kwargs):
            name = getattr(method, "__name__", str(method))
            if name == "init_cache":
                ids = args[0]
                key = jnp.sum(ids, axis=1, keepdims=True)
                logits = _fake_logits(key)
                return logits, {"self_kt": jnp.zeros((2, b * k, 4)),
                                "self_v": jnp.zeros((2, b * k, 4))}
            # decode_step(new_tokens, index, pos_ids, key_mask, cache, ...)
            toks = args[0]
            cache = args[4]
            key = (toks[:, None].astype(jnp.float32)
                   + jnp.sum(cache["self_v"], axis=(0, 2), keepdims=False
                             ).reshape(-1, 1))
            return _fake_logits(key), cache

    def _fake_logits(key):
        base = jnp.sin(key * jnp.arange(1, v + 1)[None, :] * 0.37) * 4.0
        return base.astype(jnp.float32)

    prompt_ids = jnp.asarray(rng.integers(3, v, size=(b, p)), jnp.int32)
    prompt_mask = jnp.ones((b, p), jnp.int32)
    enc = jnp.zeros((b, 4, 8), jnp.float32)

    outs = {}
    orig = gen.BEAM_UPDATE_IMPL
    try:
        for impl in ("xla", "kernel"):
            gen.BEAM_UPDATE_IMPL = impl
            outs[impl] = gen.beam_search(
                StubModel(), {}, enc, prompt_ids, prompt_mask, num_beams=k,
                max_length=t, min_length=p + 2, eos_token_id=EOS,
                pad_token_id=PAD)
    finally:
        gen.BEAM_UPDATE_IMPL = orig
    np.testing.assert_array_equal(np.asarray(outs["xla"][0]),
                                  np.asarray(outs["kernel"][0]))
    np.testing.assert_array_equal(np.asarray(outs["xla"][1]),
                                  np.asarray(outs["kernel"][1]))
