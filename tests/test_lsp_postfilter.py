"""LSP postfilter (postfiltering_lsp, Training.pl:2690-2752).

Gates:
- lsp_to_lpc inverts the palindromic-split LSP decomposition (roundtrip
  vs numpy polyroots) for even and odd orders incl. the WORLD config's
  order 49;
- lsp_sharpen matches a literal scalar transcription of the Perl formula
  and preserves ordering after lsp_check;
- faithful mode leaves the gain unchanged (the reference's energy
  'correction' divides ene2 by itself — ene1 is written then deleted
  unused); energy_match mode compensates the sharpened spectrum's energy.
"""
import numpy as np
import jax.numpy as jnp

from hts_train_world_tpu.ops import postfilter as pf


def _stable_lpc(m, seed):
    rng = np.random.default_rng(seed)
    k = rng.uniform(-0.6, 0.6, m)
    a = np.zeros(0)
    for i in range(m):
        a = np.concatenate([a + k[i] * a[::-1], [k[i]]])
    return a


def _lsp_from_lpc(a):
    p = len(a)
    A = np.concatenate([[1.0], a])
    P = np.concatenate([A, [0.0]]) + np.concatenate([[0.0], A[::-1]])
    Q = np.concatenate([A, [0.0]]) - np.concatenate([[0.0], A[::-1]])

    def angles(poly):
        r = np.roots(poly)
        r = r[np.abs(np.imag(r)) > 1e-9]
        w = np.angle(r)
        return np.sort(w[w > 0])

    return np.sort(np.concatenate([angles(P), angles(Q)]))


def test_lsp_to_lpc_roundtrip():
    # low order: LPC -> LSP (polyroots) -> lsp_to_lpc recovers the LPC
    for m, seed in ((4, 0), (5, 1), (8, 2), (9, 7)):
        a = _stable_lpc(m, seed)
        w = _lsp_from_lpc(a)
        assert len(w) == m
        a2 = np.asarray(pf.lsp_to_lpc(jnp.asarray(w)))
        np.testing.assert_allclose(a2, a, atol=1e-8)


def test_lsp_to_lpc_high_order():
    # high order (the WORLD config's 49): LSP -> LPC -> LSP closes the
    # loop (np.roots on the palindromic split is unit-circle-conditioned;
    # a direct degree-49 LPC->LSP reference is not)
    for m, seed in ((20, 2), (49, 3)):
        rng = np.random.default_rng(seed)
        w = np.sort(rng.uniform(0.03, np.pi - 0.03, m))
        w += np.linspace(0, 1e-3, m)  # enforce distinctness
        a = np.asarray(pf.lsp_to_lpc(jnp.asarray(w)))
        w2 = _lsp_from_lpc(a)
        assert len(w2) == m
        np.testing.assert_allclose(w2, w, atol=1e-6)


def test_sharpen_matches_scalar_formula():
    rng = np.random.default_rng(4)
    w = np.sort(rng.uniform(0.05, np.pi - 0.05, 12))
    out = np.asarray(pf.lsp_sharpen(jnp.asarray(w), pf=0.7))
    ref = w.copy()
    for i in range(1, len(w) - 1):
        d1 = 0.7 * (w[i + 1] - w[i])
        d2 = 0.7 * (w[i] - w[i - 1])
        ref[i] = w[i - 1] + d2 + (d2 * d2 * ((w[i + 1] - w[i - 1])
                                             - (d1 + d2))) \
            / (d2 * d2 + d1 * d1)
    np.testing.assert_allclose(out, ref, atol=1e-12)
    assert out[0] == w[0] and out[-1] == w[-1]


def test_postfilter_modes():
    rng = np.random.default_rng(5)
    T, m = 7, 13
    lsp = np.sort(rng.uniform(0.05, np.pi - 0.05, (T, m)), axis=1)
    gain = rng.standard_normal(T)
    frames = jnp.asarray(np.concatenate([gain[:, None], lsp], 1))
    out_faithful = np.asarray(pf.lsp_postfilter(frames, 0.7))
    # faithful: gain untouched (the reference's no-op correction)
    np.testing.assert_array_equal(out_faithful[:, 0], gain)
    # output LSPs stay ordered in (0, pi)
    w = out_faithful[:, 1:]
    assert (np.diff(w, axis=1) > 0).all() and (w > 0).all() \
        and (w < np.pi).all()
    out_matched = np.asarray(pf.lsp_postfilter(frames, 0.7,
                                               energy_match=True))
    assert np.all(np.isfinite(out_matched))
    # energy correction holds the all-pole energy fixed
    e0 = np.asarray(pf.lsp_spectrum_energy(jnp.asarray(gain),
                                           jnp.asarray(lsp)))
    e1 = np.asarray(pf.lsp_spectrum_energy(
        jnp.asarray(out_matched[:, 0]), jnp.asarray(out_matched[:, 1:])))
    np.testing.assert_allclose(e1, e0, atol=1e-6)
