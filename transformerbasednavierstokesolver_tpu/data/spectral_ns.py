"""Pseudo-spectral 2D incompressible Navier-Stokes ground-truth generator.

TPU-native replacement for the reference's phiflow pipeline
(``data_generation.ipynb`` cells 3-4: McWilliams random vorticity ->
``make_incompressible`` -> semi-Lagrangian advection at dt=0.5 on a 64x64
periodic grid) and for the downloaded FNO vorticity benchmark data
(``README.md:29``).

Method: vorticity-streamfunction formulation on a periodic square,
``w_t + u . grad(w) = nu lap(w) + f``, solved in Fourier space with 2/3-rule
dealiasing, Crank-Nicolson for the viscous term and Heun (RK2) for the
nonlinear term.  Everything is ``jnp.fft`` + elementwise ops under
``lax.scan``; batches of simulations run under ``vmap`` on device.

Initial conditions:
  * ``mcwilliams_vorticity_hat``: McWilliams (1984) random realizability
    ensemble -- |psi_k|^2 ~ k^-1 (1 + (k/k0)^4)^-1, random phases,
    normalized to unit kinetic energy (what the fork's external
    ``2D-Turbulence-Python`` package produces);
  * ``gaussian_random_field_hat``: the FNO-style periodic GRF
    ~ N(0, 7^{3/2} (-lap + 49 I)^{-2.5}) used for the vorticity benchmark.
"""

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# FFT backend.  The experimental axon TPU backend implements only the
# real->complex forward FFT; inverse/complex transforms raise UNIMPLEMENTED.
# On TPU we therefore evaluate the DFT as matmuls on the MXU: for the
# benchmark sizes (64..256) the dense DFT matrix is tiny and F X F (F is
# symmetric) is two [n,n]x[n,n] matmuls -- exactly what the systolic array
# is built for.  CPU keeps jnp.fft.
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=8)
def _dft_mats_np(n):
    jk = np.outer(np.arange(n), np.arange(n))
    w = np.exp(-2j * np.pi * jk / n)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _dft_mats(n):
    # cache CONCRETE numpy, convert at the use site: caching jnp arrays
    # would capture a tracer when first called under jit, which a later
    # retrace (different batch shape) then picks up -> UnexpectedTracerError
    wr, wi = _dft_mats_np(n)
    return jnp.asarray(wr), jnp.asarray(wi)


def _cmatmul(ar, ai, br, bi):
    """(ar + i ai) @ (br + i bi) with f32 accumulation on the MXU."""
    import jax

    hp = jax.lax.Precision.HIGHEST
    rr = jnp.matmul(ar, br, precision=hp) - jnp.matmul(ai, bi, precision=hp)
    ii = jnp.matmul(ar, bi, precision=hp) + jnp.matmul(ai, br, precision=hp)
    return rr, ii


def _dft2_mm(x, inverse):
    """2D DFT of [..., n, n] complex via F @ X @ F matmuls (F symmetric)."""
    n = x.shape[-1]
    fr, fi = _dft_mats(n)
    if inverse:
        fi = -fi
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    yr, yi = _cmatmul(fr, fi, xr, xi)   # rows:  F @ X   (broadcasts over batch)
    yr, yi = _cmatmul(yr, yi, fr, fi)   # cols:  (F X) @ F
    if inverse:
        yr, yi = yr / (n * n), yi / (n * n)
    return jax.lax.complex(yr, yi)


def _use_mm_fft():
    import jax

    mode = os.environ.get("TBNSS_FFT", "auto")
    if mode == "matmul":
        return True
    if mode == "native":
        return False
    return jax.default_backend() not in ("cpu",)


def _fft2(x):
    if _use_mm_fft():
        return _dft2_mm(x, inverse=False)
    return jnp.fft.fft2(x)


def _ifft2(x):
    if _use_mm_fft():
        return _dft2_mm(x, inverse=True)
    return jnp.fft.ifft2(x)


# ---------------------------------------------------------------------------
# Complex-free (re/im pair) spectral core.  The axon TPU backend implements
# complex construction but NOT complex arithmetic (even z*w raises
# UNIMPLEMENTED), so the entire hot path below carries spectra as stacked
# real pairs ``[..., 2, n, n]`` and the DFTs run as real matmuls on the MXU.
# CPU uses the same pair interface backed by jnp.fft.
# ---------------------------------------------------------------------------


def _to_pair(z):
    """complex [..., n, n] -> pair [..., 2, n, n] (host/CPU boundary only)."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-3).astype(jnp.float32)


def _from_pair(p):
    return jax.lax.complex(p[..., 0, :, :], p[..., 1, :, :])


def _fft2p(p, inverse=False):
    """2D DFT of a pair [..., 2, n, n] -> pair."""
    if not _use_mm_fft():
        z = _from_pair(p)
        y = jnp.fft.ifft2(z) if inverse else jnp.fft.fft2(z)
        return _to_pair(y)
    n = p.shape[-1]
    fr, fi = _dft_mats(n)
    if inverse:
        fi = -fi
    xr = p[..., 0, :, :]
    xi = p[..., 1, :, :]
    yr, yi = _cmatmul(fr, fi, xr, xi)
    yr, yi = _cmatmul(yr, yi, fr, fi)
    if inverse:
        yr, yi = yr / (n * n), yi / (n * n)
    return jnp.stack([yr, yi], axis=-3)


def _ifft2p_re(p):
    """Real part of the inverse DFT of a pair -> real [..., n, n]."""
    return _fft2p(p, inverse=True)[..., 0, :, :]


def _fft2p_real(x):
    """Forward DFT of a real field -> pair (half the matmuls of _fft2p)."""
    if not _use_mm_fft():
        return _to_pair(jnp.fft.fft2(x.astype(jnp.float32)))
    n = x.shape[-1]
    fr, fi = _dft_mats(n)
    import jax as _jax

    hp = _jax.lax.Precision.HIGHEST
    x = x.astype(jnp.float32)
    ar = jnp.matmul(fr, x, precision=hp)
    ai = jnp.matmul(fi, x, precision=hp)
    yr = jnp.matmul(ar, fr, precision=hp) - jnp.matmul(ai, fi, precision=hp)
    yi = jnp.matmul(ar, fi, precision=hp) + jnp.matmul(ai, fr, precision=hp)
    return jnp.stack([yr, yi], axis=-3)


def _imulk(p, k):
    """Multiply a pair by i*k for real wavenumber field k."""
    return jnp.stack(
        [-k * p[..., 1, :, :], k * p[..., 0, :, :]], axis=-3
    )


def _rmul(p, r):
    """Multiply a pair by a real field (broadcast over the pair axis)."""
    return p * r[..., None, :, :]


# Default forcing of the FNO NS benchmark: 0.1 (sin + cos)(2 pi (x + y)).
def fno_forcing(n):
    t = jnp.linspace(0, 1, n + 1)[:-1]
    X, Y = jnp.meshgrid(t, t, indexing="ij")
    return 0.1 * (jnp.sin(2 * jnp.pi * (X + Y)) + jnp.cos(2 * jnp.pi * (X + Y)))


def _wavenumbers(n, domain=1.0):
    k = jnp.fft.fftfreq(n, d=1.0 / n) * (2 * jnp.pi / domain)
    kx, ky = jnp.meshgrid(k, k, indexing="ij")
    k2 = kx**2 + ky**2
    k2_safe = jnp.where(k2 == 0, 1.0, k2)
    return kx, ky, k2, k2_safe


def _dealias_mask(n):
    # fftfreq(n, d=1/n) already returns integer wavenumbers -n/2..n/2-1.
    # (Round 1 multiplied by n again, so the mask kept only k=0 and silently
    # zeroed the whole nonlinear term -- the generator was integrating pure
    # forced diffusion.  Caught by the manufactured-advection test in
    # tests/test_spectral.py::test_nonlinear_term_manufactured_solution.)
    k = jnp.fft.fftfreq(n, d=1.0 / n)
    kx, ky = jnp.meshgrid(k, k, indexing="ij")
    cutoff = n / 3.0
    return (jnp.abs(kx) <= cutoff) & (jnp.abs(ky) <= cutoff)


def mcwilliams_vorticity_pair(key, n, k0=6.0, domain=2 * jnp.pi):
    """McWilliams-84 random initial vorticity as a spectral re/im pair."""
    kx, ky, k2, k2_safe = _wavenumbers(n, domain)
    kmag = jnp.sqrt(k2)
    # |psi_k| ~ (k (1 + (k/k0)^4))^{-1/2}
    spectrum = jnp.where(
        k2 > 0,
        (kmag * (1 + (kmag / k0) ** 4)) ** -0.5,
        0.0,
    )
    kr, ki = jax.random.split(key)
    phase = jnp.stack(
        [jax.random.normal(kr, (n, n)), jax.random.normal(ki, (n, n))]
    )
    psi_p = _rmul(phase, spectrum)
    # Hermitian-symmetrize so psi is real and u/v/w stay exactly consistent
    psi_p = _fft2p_real(_ifft2p_re(psi_p))
    # normalize kinetic energy KE = 0.5 <|u|^2 + |v|^2> to 0.5
    u = _ifft2p_re(_imulk(psi_p, ky))
    v = _ifft2p_re(_imulk(psi_p, -kx))
    ke = 0.5 * jnp.mean(u**2 + v**2)
    psi_p = psi_p / jnp.sqrt(2 * ke)
    return _rmul(psi_p, k2)  # w = -lap psi  ->  w_hat = k2 psi_hat


def mcwilliams_vorticity_hat(key, n, k0=6.0, domain=2 * jnp.pi):
    """Complex-dtype convenience wrapper around the pair form."""
    return _from_pair(mcwilliams_vorticity_pair(key, n, k0, domain))


def gaussian_random_field_hat(key, n, alpha=2.5, tau=7.0):
    """FNO GRF w0 ~ N(0, tau^(2 alpha - 2) (-lap + tau^2 I)^(-alpha)), periodic.

    Matches the benchmark's GaussianRF sampler exactly (Li et al. 2020;
    the nu=1e-5 data the reference downloads, ``README.md:29``):
    sqrt_eig(k) = n^2 sqrt(2) tau^(alpha-1) (4 pi^2 |k|^2 + tau^2)^(-alpha/2),
    complex standard-normal coefficients, real part -> E|w_hat(k)|^2 =
    sqrt_eig^2.  (Round 1 scaled by n instead of n^2 sqrt(2): fields ~90x
    too weak, leaving the flow in the near-linear regime -- the root cause
    of the implausibly easy round-1 synthetic NS data.)
    """
    return _from_pair(gaussian_random_field_pair(key, n, alpha, tau))


def gaussian_random_field_pair(key, n, alpha=2.5, tau=7.0):
    """Pair-form FNO GRF (see ``gaussian_random_field_hat``)."""
    kx, ky, k2, _ = _wavenumbers(n, domain=1.0)
    # k2 = 4 pi^2 |k_int|^2: eigenvalues of -lap on the unit torus
    coef = (k2 + tau**2) ** (-alpha / 2.0)
    coef = coef * tau ** (alpha - 1) * np.sqrt(2.0) * n * n
    coef = coef.at[0, 0].set(0.0)  # zero mean
    kr, ki = jax.random.split(key)
    noise = jnp.stack(
        [jax.random.normal(kr, (n, n)), jax.random.normal(ki, (n, n))]
    )
    f_p = _rmul(noise, coef)
    return _fft2p_real(_ifft2p_re(f_p))


def spectral_downsample(fields, n_out):
    """Fourier-truncate real [..., N, N] fields to [..., n_out, n_out].

    The FNO benchmark solves nu=1e-5 vorticity on a 256^2 grid and
    downsamples to 64^2 (Li et al. 2020, appendix; the reference consumes
    the downloaded 64^2 product, ``README.md:29``).  Mode truncation keeps
    the resolved part of the 256^2 solution bit-consistent with its own
    low-pass, which direct 64^2 integration at nu=1e-5 does not (it is
    badly under-resolved -- see tests/test_spectral.py).
    """
    n_in = fields.shape[-1]
    if n_in == n_out:
        return fields
    h = n_out // 2
    f_p = _fft2p_real(fields)
    corners = jnp.concatenate(
        [
            jnp.concatenate([f_p[..., :h, :h], f_p[..., :h, -h:]], axis=-1),
            jnp.concatenate([f_p[..., -h:, :h], f_p[..., -h:, -h:]], axis=-1),
        ],
        axis=-2,
    )
    return _ifft2p_re(corners) * (n_out / n_in) ** 2


def radial_energy_spectrum(w, domain=1.0):
    """Radially-binned kinetic-energy spectrum E(k) of a vorticity field.

    Returns (k_bins [n//2], E [n//2]) with E(k) = sum over the annulus
    |k_int - k| < 1/2 of 0.5 |u_hat|^2 / n^4 (KE per integer wavenumber).
    """
    n = w.shape[-1]
    kx, ky, k2, k2_safe = _wavenumbers(n, domain)
    w_hat = _fft2(w)
    # |u_hat|^2 = |k x psi_hat|^2 = k2 |psi_hat|^2 = |w_hat|^2 / k2
    e_density = jnp.where(k2 > 0, 0.5 * jnp.abs(w_hat) ** 2 / k2_safe, 0.0)
    e_density = e_density / n**4  # Parseval: mean KE = sum(e_density)
    scale = domain / (2 * jnp.pi)  # bin by integer mode index
    kmag = jnp.sqrt(k2) * scale
    nbins = n // 2
    idx = jnp.clip(jnp.round(kmag).astype(jnp.int32), 0, nbins)
    spec = jnp.zeros(nbins + 1).at[idx.ravel()].add(e_density.ravel())
    return jnp.arange(1, nbins), spec[1:nbins]


def enstrophy(w):
    """Mean enstrophy 0.5 <w^2> of physical vorticity fields."""
    return 0.5 * jnp.mean(w**2, axis=(-2, -1))


def velocity_from_vorticity_pair(w_p, domain=1.0):
    """(u, v) physical fields from a spectral vorticity pair."""
    n = w_p.shape[-1]
    kx, ky, k2, k2_safe = _wavenumbers(n, domain)
    psi_p = _rmul(w_p, jnp.where(k2 > 0, 1.0 / k2_safe, 0.0))
    u = _ifft2p_re(_imulk(psi_p, ky))
    v = _ifft2p_re(_imulk(psi_p, -kx))
    return u, v


def velocity_from_vorticity_hat(w_hat, domain=1.0):
    """Complex-dtype convenience wrapper around the pair form."""
    return velocity_from_vorticity_pair(_to_pair(w_hat), domain)


def _nonlinear_pair(w_p, kx, ky, k2_safe, k2, mask):
    """Dealiased spectral advection term -(u . grad w), pair form."""
    psi_p = _rmul(w_p, jnp.where(k2 > 0, 1.0 / k2_safe, 0.0))
    u = _ifft2p_re(_imulk(psi_p, ky))
    v = _ifft2p_re(_imulk(psi_p, -kx))
    wx = _ifft2p_re(_imulk(w_p, kx))
    wy = _ifft2p_re(_imulk(w_p, ky))
    adv = u * wx + v * wy
    return -_rmul(_fft2p_real(adv), mask.astype(jnp.float32))


def _nonlinear_hat(w_hat, kx, ky, k2_safe, k2, mask):
    """Complex-dtype wrapper kept for the physics unit tests."""
    return _from_pair(
        _nonlinear_pair(_to_pair(w_hat), kx, ky, k2_safe, k2, mask)
    )


@partial(jax.jit, static_argnums=(2, 3, 6))
def simulate_vorticity_pair(w_p0, f_p, n_steps: int, record_every: int,
                            dt, nu, domain: float = 1.0):
    """Integrate a spectral vorticity pair; returns [n_records, n, n] physical
    snapshots.  Heun for advection + Crank-Nicolson for diffusion per
    substep; records a physical-space snapshot every ``record_every``
    substeps.  Complex-free: runs on backends without complex arithmetic
    (the DFTs are MXU matmuls on TPU)."""
    n = w_p0.shape[-1]
    kx, ky, k2, k2_safe = _wavenumbers(n, domain)
    mask = _dealias_mask(n)
    cn_num = 1.0 - 0.5 * dt * nu * k2
    cn_den = 1.0 / (1.0 + 0.5 * dt * nu * k2)

    def substep(w_p, _):
        nl1 = _nonlinear_pair(w_p, kx, ky, k2_safe, k2, mask) + f_p
        w_mid = _rmul(_rmul(w_p, cn_num) + dt * nl1, cn_den)
        nl2 = _nonlinear_pair(w_mid, kx, ky, k2_safe, k2, mask) + f_p
        w_new = _rmul(
            _rmul(w_p, cn_num) + 0.5 * dt * (nl1 + nl2), cn_den
        )
        return w_new, None

    def record_step(w_p, _):
        w_p, _ = lax.scan(substep, w_p, None, length=record_every)
        return w_p, _ifft2p_re(w_p)

    n_records = n_steps // record_every
    _, frames = lax.scan(record_step, w_p0, None, length=n_records)
    return frames


@partial(jax.jit, static_argnums=(2, 5))
def advance_vorticity_pair(w_p, f_p, n_sub: int, dt, nu, domain: float = 1.0):
    """Advance a (batched) spectral vorticity pair by n_sub substeps.

    Host-side frame loops call this once per recorded frame: long
    trajectories then run as many ~seconds-long dispatches instead of one
    multi-minute one (the remote TPU transport kills overlong dispatches).
    """
    n = w_p.shape[-1]
    kx, ky, k2, k2_safe = _wavenumbers(n, domain)
    mask = _dealias_mask(n)
    cn_num = 1.0 - 0.5 * dt * nu * k2
    cn_den = 1.0 / (1.0 + 0.5 * dt * nu * k2)

    def substep(w, _):
        nl1 = _nonlinear_pair(w, kx, ky, k2_safe, k2, mask) + f_p
        w_mid = _rmul(_rmul(w, cn_num) + dt * nl1, cn_den)
        nl2 = _nonlinear_pair(w_mid, kx, ky, k2_safe, k2, mask) + f_p
        return _rmul(_rmul(w, cn_num) + 0.5 * dt * (nl1 + nl2), cn_den), None

    w_p, _ = lax.scan(substep, w_p, None, length=n_sub)
    return w_p


def simulate_vorticity(w_hat0, f_hat, n_steps: int, record_every: int,
                       dt, nu, domain: float = 1.0):
    """Complex-dtype convenience wrapper around ``simulate_vorticity_pair``."""
    return simulate_vorticity_pair(
        _to_pair(w_hat0), _to_pair(f_hat), n_steps, record_every, dt, nu,
        domain,
    )


def generate_vorticity_dataset(
    key, sims, frames, n=64, nu=1e-5, dt=1e-3, frame_dt=1.0,
    init="grf", forced=True, warmup_frames=0, sim_n=None, batch=None,
    progress=None, downsample="spectral",
):
    """FNO-benchmark-style dataset: [sims, n, n, frames] vorticity snapshots.

    ``sim_n`` (default ``n``): solver resolution.  The benchmark regime for
    nu=1e-5 is sim_n=256, dt=1e-4, frame_dt=1 (Li et al. 2020): the IC is
    drawn at sim_n and the recorded frames are reduced to ``n``.
    ``downsample``: 'spectral' Fourier-truncates (alias-free low-pass);
    'pointwise' records ``w[::sim_n//n, ::sim_n//n]`` exactly like the
    official generation script (``sol[::sub, ::sub]``), retaining aliased
    high-k content -- the official 64^2 files are pointwise products, so
    this mode reproduces their observed noisier dynamics (round-3
    regime-fidelity audit, docs/RESULTS.md caveats).
    ``batch``: chunk the vmap over sims to bound memory at high sim_n.
    """
    sim_n = sim_n or n
    keys = jax.random.split(key, sims)
    f_p = (_fft2p_real(fno_forcing(sim_n)) if forced
           else jnp.zeros((2, sim_n, sim_n), jnp.float32))
    record_every = max(int(round(frame_dt / dt)), 1)
    n_steps = record_every * (frames + warmup_frames)

    ic = (gaussian_random_field_pair if init == "grf"
          else mcwilliams_vorticity_pair)
    if downsample == "pointwise" and sim_n != n:
        if sim_n % n:
            raise ValueError(
                f"pointwise downsample needs n | sim_n, got {sim_n}/{n}"
            )
        stride = sim_n // n
        down = jax.jit(lambda w_p: _ifft2p_re(w_p)[..., ::stride, ::stride])
    elif downsample in ("spectral", "pointwise"):
        down = jax.jit(lambda w_p: spectral_downsample(_ifft2p_re(w_p), n))
    else:
        raise ValueError(downsample)

    batch = batch or sims
    chunks = []
    for i in range(0, sims, batch):
        w_p = jax.vmap(lambda k: ic(k, sim_n))(keys[i:i + batch])
        frames_list = []
        for fr in range(frames + warmup_frames):
            # bounded ~1k-substep dispatches (the remote TPU transport hangs
            # on multi-minute single dispatches)
            left = record_every
            while left > 0:
                sub = min(left, 1000)
                w_p = advance_vorticity_pair(w_p, f_p, sub, dt, nu)
                left -= sub
            if fr >= warmup_frames:
                frames_list.append(np.asarray(down(w_p), np.float32))
            if progress:
                progress(i, fr)
        chunks.append(np.stack(frames_list, axis=1))  # [b, frames, n, n]
    frames_t = np.concatenate(chunks, 0)
    return np.ascontiguousarray(
        frames_t.transpose(0, 2, 3, 1).astype(np.float32))


def generate_velocity_dataset(
    key, sims, frames, n=64, re=100.0, dt=1e-2, frame_dt=0.5,
):
    """Fork-style velocity dataset: [sims, n, n, 2*frames], channels
    interleaved [vel1x, vel1y, vel2x, vel2y, ...] like
    ``data_generation.ipynb`` cell 6.  Decaying McWilliams turbulence,
    nu = 1/Re on a 2pi-periodic domain."""
    keys = jax.random.split(key, sims)
    nu = 1.0 / re
    domain = 2 * np.pi
    f_p = jnp.zeros((2, n, n), jnp.float32)
    record_every = max(int(round(frame_dt / dt)), 1)
    # frame 0 is the McWilliams IC itself (data_generation.ipynb cell 6
    # iterates frame_number-1 steps and includes the initial field) --
    # the pre-review version recorded only evolved frames, shifting the
    # whole trajectory by one frame vs the fork's layout
    n_steps = record_every * (frames - 1)

    kx, ky, k2, k2_safe = _wavenumbers(n, domain)

    def one(k):
        w0 = mcwilliams_vorticity_pair(k, n, domain=domain)
        evolved = simulate_vorticity_pair(
            w0, f_p, n_steps, record_every, dt, nu, domain
        )  # [frames-1, n, n]
        traj = jnp.concatenate(
            [_ifft2p_re(w0)[None], evolved], axis=0
        )  # [frames, n, n]

        def to_uv(w):
            u, v = velocity_from_vorticity_pair(_fft2p_real(w), domain)
            return jnp.stack([u, v], axis=-1)

        uv = jax.vmap(to_uv)(traj)  # [frames, n, n, 2]
        return uv

    uv = jax.vmap(one)(keys)  # [sims, frames, n, n, 2]
    sims_, fr, nn, _, _ = uv.shape
    out = uv.transpose(0, 2, 3, 1, 4).reshape(sims_, nn, nn, 2 * fr)
    return np.asarray(out, dtype=np.float32)
