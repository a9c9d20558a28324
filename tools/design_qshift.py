"""Design the q-shift filter for the dual-tree complex wavelet transform.

DESIGN PROVENANCE for ``vectorwave_tpu/wavelets/qshift.py``: the committed
lattice angles there are produced by THIS script (seeded, reproducible) —
nothing is copied from published filter tables.

Method: an orthonormal two-channel FIR bank of length 2K is parametrized by
K paraunitary-lattice rotations (Vaidyanathan), so perfect reconstruction
and orthonormality hold EXACTLY for any angles; the constraint
``sum(theta) = pi/4`` pins one exact vanishing moment.  The free angles are
then optimized (Adam, float64) for the q-shift property: passband phase as
close as possible to the fractional delay ``tau = (L-1)/2 - 1/4``, plus a
stopband-energy and second-moment term.  Tree b of the DTCWT uses the
time-reversed filter (delay ``(L-1)/2 + 1/4``), making the two trees' phase
difference a half sample per stage — the Hilbert-pair condition (Selesnick
2001; Kingsbury 2001).  Initialization fits the lattice to a
fractional-delay windowed-sinc half-band target, which lands every restart
in the right basin.

Run: python tools/design_qshift.py [K]   (default K=7 -> 14 taps)
Prints the angles and the achieved analyticity metrics.
"""

from __future__ import annotations

import sys

import numpy as np

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # pure host-side design task
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402


def lattice_filters(thetas):
    """jax twin of ``wavelets.qshift.lattice_filters`` (differentiable);
    tests assert the two produce identical filters."""
    K = thetas.shape[0]
    E = jnp.zeros((2, 2, K))
    c0, s0 = jnp.cos(thetas[0]), jnp.sin(thetas[0])
    E = E.at[:, :, 0].set(
        jnp.stack([jnp.stack([c0, -s0]), jnp.stack([s0, c0])])
    )
    for i in range(1, K):
        delayed = jnp.zeros_like(E)
        delayed = delayed.at[0, :, :].set(E[0, :, :])
        delayed = delayed.at[1, :, 1:].set(E[1, :, :-1])
        c, s = jnp.cos(thetas[i]), jnp.sin(thetas[i])
        rot = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
        E = jnp.einsum("ab,bcn->acn", rot, delayed)
    h = jnp.zeros(2 * K).at[0::2].set(E[1, 0]).at[1::2].set(E[1, 1])
    g = jnp.zeros(2 * K).at[0::2].set(E[0, 0]).at[1::2].set(E[0, 1])
    return h, g


def freqz(f, w):
    n = jnp.arange(f.shape[0])
    return jnp.einsum(
        "k,wk->w", f.astype(jnp.complex128),
        jnp.exp(-1j * w[:, None] * n),
    )


def wavelet_spectrum(h, g, w, level):
    acc = freqz(g, (2.0 ** (level - 1)) * w)
    for j in range(level - 1):
        acc = acc * freqz(h, (2.0 ** j) * w)
    return acc


def analyticity(h, g, level, n_grid=8192):
    """Energy fraction of psi_a - i psi_b on the wrong (negative) side."""
    w = jnp.linspace(-np.pi, np.pi, n_grid, endpoint=False)
    pa = wavelet_spectrum(h, g, w, level)
    pb = wavelet_spectrum(h[::-1], g[::-1], w, level)
    e = np.abs(np.asarray(pa - 1j * pb)) ** 2
    return float(e[np.asarray(w) < 0].sum() / e.sum())


def design(K: int = 7, seed: int = 0, trials: int = 12):
    L = 2 * K
    tau = (L - 1) / 2 - 0.25
    n = np.arange(L)
    win = np.kaiser(1024, 9.0)
    widx = np.clip(((n - tau) / L + 0.5) * 1023, 0, 1023).astype(int)
    target = np.sinc((n - tau) / 2.0) / 2.0 * win[widx]
    target = jnp.asarray(target * np.sqrt(2) / target.sum())

    wfull = jnp.linspace(0, np.pi, 512)
    wstop = jnp.linspace(0.75 * np.pi, np.pi, 128)

    def full_thetas(params):
        return jnp.concatenate(
            [params, jnp.array([jnp.pi / 4 - params.sum()])]
        )

    def fit_loss(params):
        h, _ = lattice_filters(full_thetas(params))
        return jnp.sum((h - target) ** 2)

    def polish_loss(params):
        h, _ = lattice_filters(full_thetas(params))
        # The EXACT Hilbert-pair condition for a reversed tree b is
        # Im[H(w) e^{i w tau}] = 0 on the whole band (H_b = H_a e^{-iw/2}
        # rewritten); stopband magnitude and a second-moment term keep it a
        # smooth lowpass.
        hfull = freqz(h, wfull)
        hil = jnp.mean(jnp.imag(hfull * jnp.exp(1j * wfull * tau)) ** 2)
        idx = jnp.arange(L)
        d_h = jnp.einsum(
            "k,k->", h.astype(jnp.complex128),
            (-1j * idx) * jnp.exp(-1j * np.pi * idx),
        )
        stop = jnp.mean(jnp.abs(freqz(h, wstop)) ** 2)
        return hil + 0.01 * jnp.abs(d_h) ** 2 + 0.1 * stop

    def adam(loss, p0, steps, lr):
        vg = jax.jit(jax.value_and_grad(loss))
        p = np.array(p0)
        m = np.zeros_like(p)
        v = np.zeros_like(p)
        val = np.inf
        for t in range(1, steps + 1):
            val, grad = vg(jnp.asarray(p))
            grad = np.array(grad)
            m = 0.9 * m + 0.1 * grad
            v = 0.999 * v + 0.001 * grad * grad
            p = p - lr * (m / (1 - 0.9**t)) / (
                np.sqrt(v / (1 - 0.999**t)) + 1e-9
            )
        return p, float(val)

    rng = np.random.default_rng(seed)
    best = None
    for trial in range(trials):
        p0 = 0.5 * rng.standard_normal(K - 1)
        p1, _ = adam(fit_loss, p0, 1500, 0.05)
        p2, _ = adam(polish_loss, p1, 4000, 0.01)
        p2, pv = adam(polish_loss, p2, 4000, 0.001)
        h, g = lattice_filters(full_thetas(jnp.asarray(p2)))
        a4 = analyticity(h, g, 4)
        print(f"trial {trial}: polish {pv:.6f}  neg-energy(J=4) {a4:.5f}")
        score = a4
        if best is None or score < best[0]:
            best = (score, p2)
    return np.asarray(best[1])  # the K-1 FREE angles (last is pi/4 - sum)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    free = design(K)
    thetas = np.concatenate([free, [np.pi / 4 - free.sum()]])
    h, g = lattice_filters(jnp.asarray(thetas))
    hn = np.asarray(h)
    L = len(hn)
    print("\nQSHIFT_THETAS (free, for wavelets/qshift.py) =",
          [round(float(t), 15) for t in free])
    print("sum h:", hn.sum(), " (sqrt2 =", np.sqrt(2), ")")
    print("max even-shift dot:",
          max(abs(np.dot(hn[:-k], hn[k:])) for k in range(2, L, 2)))
    for level in (1, 2, 3, 4, 5):
        print(f"neg-energy J={level}: {analyticity(h, g, level):.5f}")


if __name__ == "__main__":
    main()
