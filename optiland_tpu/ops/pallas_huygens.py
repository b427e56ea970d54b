"""Pallas TPU kernel for the Huygens-Fresnel direct summation.

The reference's #1 native site is the O(N_image x N_pupil) wavelet
summation (reference: optiland/psf/huygens_fresnel_strategies.py:64-175, a
Numba parallel loop). The XLA path (psf/huygens_fresnel.huygens_field)
materializes (chunk, Q) pairwise intermediates in HBM between fused ops;
this kernel keeps a tile of image points resident in VMEM and streams the
pupil through it in (8, 128)-point blocks, accumulating the coherent field
in place — each pairwise term costs zero HBM traffic.

Layout: image points are a (P, 1) column (sublane axis); each sequential
grid step loads a (8, 128) pupil block and the unrolled row loop forms
(TILE_IMG, 128) pairwise distance/phase blocks on the VPU. Outputs are the
real and imaginary field accumulated across pupil steps (grid iterations
on a TPU core run sequentially, so read-modify-write of the output block
is race-free).

Complex arithmetic is expanded to real pairs (complex dtypes do not lower
to TPU Pallas). Padded pupil lanes carry zero amplitude AND far-away
coordinates so 1/R stays finite; padded image rows are discarded by the
caller.

Gradients: custom VJP whose backward differentiates the identical jnp
formula (psf/huygens_fresnel.huygens_field) — exactness over speed on the
rare PSF-gradient path, speed on the common forward path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optiland_tpu.ops.pallas_trace import mosaic_compile_ctx

TILE_IMG = 256  # image points per program (sublane axis, f32 tile = 8)
PUP_ROWS = 8  # pupil rows per grid step: 8 * 128 = 1024 points
LANE = 128


def _kernel(img_refs, pup_refs, k_ref, out_re_ref, out_im_ref):
    ix_ref, iy_ref, iz_ref = img_refs
    px_ref, py_ref, pz_ref, nx_ref, ny_ref, nz_ref, pre_ref, pim_ref = pup_refs

    q = pl.program_id(1)
    k = k_ref[0]
    ix = ix_ref[:]  # (TILE_IMG, 1)
    iy = iy_ref[:]
    iz = iz_ref[:]

    acc_re = jnp.zeros_like(ix)
    acc_im = jnp.zeros_like(ix)
    for r in range(PUP_ROWS):
        px = px_ref[r, :][None, :]  # (1, LANE)
        py = py_ref[r, :][None, :]
        pz = pz_ref[r, :][None, :]
        dx = ix - px  # (TILE_IMG, LANE)
        dy = iy - py
        dz = iz - pz
        R = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        inv_R = 1.0 / R
        kR = k * R
        cw = jnp.cos(kR) * inv_R
        sw = jnp.sin(kR) * inv_R
        dot = (
            dx * nx_ref[r, :][None, :]
            + dy * ny_ref[r, :][None, :]
            + dz * nz_ref[r, :][None, :]
        )
        obliq = 0.5 * (1.0 + dot * inv_R)
        pre = pre_ref[r, :][None, :]
        pim = pim_ref[r, :][None, :]
        # (pre + i pim) * (cw + i sw) * obliq, reduced over the lane axis
        term_re = (pre * cw - pim * sw) * obliq
        term_im = (pre * sw + pim * cw) * obliq
        acc_re = acc_re + jnp.sum(term_re, axis=1, keepdims=True)
        acc_im = acc_im + jnp.sum(term_im, axis=1, keepdims=True)

    @pl.when(q == 0)
    def _():
        out_re_ref[:] = acc_re
        out_im_ref[:] = acc_im

    @pl.when(q > 0)
    def _():
        out_re_ref[:] = out_re_ref[:] + acc_re
        out_im_ref[:] = out_im_ref[:] + acc_im


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_field(img, pup, k, interpret=False):
    """img: 3 x (P,) arrays; pup: 8 x (Q,) arrays; returns complex (P,)."""
    P = img[0].shape[0]
    Q = pup[0].shape[0]
    # Mosaic cannot lower f64 (and x64 mode would also leak i64 constants
    # into the lowering); compiled mode always runs the kernel in f32.
    # Interpret mode (CPU parity tests) keeps the caller's dtype.
    dt = img[0].dtype if interpret else jnp.float32

    pad_p = (-P) % TILE_IMG
    img2 = [jnp.pad(a.astype(dt), (0, pad_p)).reshape(-1, 1) for a in img]

    blk = PUP_ROWS * LANE
    pad_q = (-Q) % blk
    pup2 = []
    for j, a in enumerate(pup):
        # far-away coordinates for padded points keep R > 0; zero amplitude
        fill = 1e6 if j < 3 else 0.0
        pup2.append(
            jnp.pad(a.astype(dt), (0, pad_q), constant_values=fill)
            .reshape(-1, LANE)
        )

    n_img = (P + pad_p) // TILE_IMG
    n_pup = (Q + pad_q) // blk
    grid = (n_img, n_pup)

    img_spec = pl.BlockSpec(
        (TILE_IMG, 1), lambda i, q: (i, 0), memory_space=pltpu.VMEM
    )
    pup_spec = pl.BlockSpec(
        (PUP_ROWS, LANE), lambda i, q: (q, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (TILE_IMG, 1), lambda i, q: (i, 0), memory_space=pltpu.VMEM
    )
    rows = n_img * TILE_IMG
    out_shape = [
        jax.ShapeDtypeStruct((rows, 1), dt),
        jax.ShapeDtypeStruct((rows, 1), dt),
    ]

    def kernel(*refs):
        _kernel(refs[:3], refs[3:11], refs[11], refs[12], refs[13])

    k_arr = jnp.asarray(jnp.reshape(k, (1,)), dt)
    with mosaic_compile_ctx(interpret):
        out_re, out_im = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[img_spec] * 3 + [pup_spec] * 8
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            interpret=interpret,
        )(*img2, *pup2, k_arr)
    # NOTE: compiled mode returns complex64 even under x64 — C128 does not
    # exist on TPU, so the upcast (if wanted) must happen outside the jit.
    return out_re.ravel()[:P] + 1j * out_im.ravel()[:P]


def huygens_field_pallas(
    image_x, image_y, image_z,
    pupil_x, pupil_y, pupil_z,
    pupil_amp, pupil_opd_mm,
    wavelength_mm, Rp,
):
    """Drop-in replacement for psf.huygens_fresnel.huygens_field.

    Forward runs the Pallas kernel; gradients fall back to the VJP of the
    identical jnp formula so jax.grad through the PSF stays exact.
    """
    k = 2.0 * jnp.pi / float(wavelength_mm)
    interpret = jax.default_backend() == "cpu"

    def _jnp_ref(ix, iy, iz, px, py, pz, amp, opd):
        from optiland_tpu.psf.huygens_fresnel import huygens_field

        return huygens_field(
            ix, iy, iz, px, py, pz, amp, opd, wavelength_mm, Rp
        )

    @jax.custom_vjp
    def field(ix, iy, iz, px, py, pz, amp, opd):
        phase_re = amp * jnp.cos(-k * opd)
        phase_im = amp * jnp.sin(-k * opd)
        nx, ny, nz = px / Rp, py / Rp, pz / Rp
        return _pallas_field(
            (ix, iy, iz),
            (px, py, pz, nx, ny, nz, phase_re, phase_im),
            k, interpret=interpret,
        )

    def _fwd(*args):
        return field(*args), args

    @jax.jit  # whole-graph compile: some adjoint ops lack eager TPU kernels
    def _bwd(args, g):
        out, vjp = jax.vjp(_jnp_ref, *args)
        return vjp(g.astype(out.dtype))

    field.defvjp(_fwd, _bwd)
    return field(
        image_x, image_y, image_z, pupil_x, pupil_y, pupil_z,
        pupil_amp, pupil_opd_mm,
    )


__all__ = ["huygens_field_pallas"]
