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

Gradients: custom VJP backed by two more Pallas kernels that run the VJP of
the identical pairwise block *inside* the kernel (jax.vjp at trace time, as
in pallas_trace's adjoint): one kernel streams pupil blocks through a
resident image tile to accumulate image-coordinate gradients, the other
transposes the roles (resident pupil block, streamed image tiles +
cotangents) to accumulate the per-pupil-point gradients. Neither
materializes the O(P x Q) pairwise intermediates in HBM that the plain-jnp
VJP would; peak memory is O(P + Q). The chain from the kernel's derived
pupil arrays (unit normals, complex amplitude) back to (px, py, pz, amp,
opd) is closed-form O(Q) jnp outside the kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optiland_tpu.ops.pallas_trace import mosaic_compile_ctx

TILE_IMG = 256  # image points per program (sublane axis, f32 tile = 8)
TILE_IMG_BWD = 128  # adjoint keeps more live values per pairwise block
PUP_ROWS = 8  # pupil rows per grid step: 8 * 128 = 1024 points
LANE = 128


def _pair_accum(ix, iy, iz, prows, k):
    """Coherent field of one (image tile, pupil block) pair.

    ``ix/iy/iz``: (T, 1) image coordinates; ``prows``: 8 arrays of
    (PUP_ROWS, LANE) pupil data (px, py, pz, nx, ny, nz, pre, pim).
    Shared by the forward kernel and (through jax.vjp) both adjoint
    kernels, so the adjoint differentiates the identical math.
    """
    px_a, py_a, pz_a, nx_a, ny_a, nz_a, pre_a, pim_a = prows
    acc_re = jnp.zeros_like(ix)
    acc_im = jnp.zeros_like(ix)
    for r in range(PUP_ROWS):
        px = px_a[r, :][None, :]  # (1, LANE)
        py = py_a[r, :][None, :]
        pz = pz_a[r, :][None, :]
        dx = ix - px  # (T, LANE)
        dy = iy - py
        dz = iz - pz
        R = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        inv_R = 1.0 / R
        kR = k * R
        cw = jnp.cos(kR) * inv_R
        sw = jnp.sin(kR) * inv_R
        dot = (
            dx * nx_a[r, :][None, :]
            + dy * ny_a[r, :][None, :]
            + dz * nz_a[r, :][None, :]
        )
        obliq = 0.5 * (1.0 + dot * inv_R)
        pre = pre_a[r, :][None, :]
        pim = pim_a[r, :][None, :]
        # (pre + i pim) * (cw + i sw) * obliq, reduced over the lane axis
        term_re = (pre * cw - pim * sw) * obliq
        term_im = (pre * sw + pim * cw) * obliq
        acc_re = acc_re + jnp.sum(term_re, axis=1, keepdims=True)
        acc_im = acc_im + jnp.sum(term_im, axis=1, keepdims=True)
    return acc_re, acc_im


def _kernel(img_refs, pup_refs, k_ref, out_re_ref, out_im_ref):
    q = pl.program_id(1)
    k = k_ref[0]
    ix = img_refs[0][:]
    iy = img_refs[1][:]
    iz = img_refs[2][:]
    prows = tuple(r[:] for r in pup_refs)
    acc_re, acc_im = _pair_accum(ix, iy, iz, prows, k)

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


# ---------------------------------------------------------------------------
# Adjoint kernels: in-kernel VJP of the pairwise block, O(P + Q) memory
# ---------------------------------------------------------------------------


def _bwd_img_kernel(img_refs, pup_refs, cot_refs, k_ref, dimg_refs):
    """Image-coordinate gradients: resident image tile, streamed pupil."""
    q = pl.program_id(1)
    k = k_ref[0]
    ix = img_refs[0][:]
    iy = img_refs[1][:]
    iz = img_refs[2][:]
    prows = tuple(r[:] for r in pup_refs)

    def f(ix, iy, iz):
        return _pair_accum(ix, iy, iz, prows, k)

    _, vjp = jax.vjp(f, ix, iy, iz)
    grads = vjp((cot_refs[0][:], cot_refs[1][:]))

    @pl.when(q == 0)
    def _():
        for ref, g in zip(dimg_refs, grads):
            ref[:] = g

    @pl.when(q > 0)
    def _():
        for ref, g in zip(dimg_refs, grads):
            ref[:] = ref[:] + g


def _bwd_pup_kernel(img_refs, pup_refs, cot_refs, k_ref, dpup_refs):
    """Per-pupil-point gradients: resident pupil block, streamed image
    tiles + cotangents (grid = (n_pup, n_img), image minor)."""
    i = pl.program_id(1)
    k = k_ref[0]
    ix = img_refs[0][:]
    iy = img_refs[1][:]
    iz = img_refs[2][:]
    prows = tuple(r[:] for r in pup_refs)

    def f(*prows):
        return _pair_accum(ix, iy, iz, prows, k)

    _, vjp = jax.vjp(f, *prows)
    grads = vjp((cot_refs[0][:], cot_refs[1][:]))

    @pl.when(i == 0)
    def _():
        for ref, g in zip(dpup_refs, grads):
            ref[:] = g

    @pl.when(i > 0)
    def _():
        for ref, g in zip(dpup_refs, grads):
            ref[:] = ref[:] + g


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_field_bwd(img, pup, g_re, g_im, k, interpret=False):
    """Gradients of the pairwise summation w.r.t. the 3 image arrays and
    the 8 derived pupil arrays, given the field cotangent (g_re, g_im)."""
    P = img[0].shape[0]
    Q = pup[0].shape[0]
    dt = img[0].dtype if interpret else jnp.float32

    tile_img = TILE_IMG_BWD
    pad_p = (-P) % tile_img
    img2 = [jnp.pad(a.astype(dt), (0, pad_p)).reshape(-1, 1) for a in img]
    # padded image rows carry zero cotangent: by VJP linearity they add
    # exactly zero to every pupil gradient
    cot2 = [
        jnp.pad(a.astype(dt), (0, pad_p)).reshape(-1, 1)
        for a in (g_re, g_im)
    ]

    blk = PUP_ROWS * LANE
    pad_q = (-Q) % blk
    pup2 = []
    for j, a in enumerate(pup):
        fill = 1e6 if j < 3 else 0.0
        pup2.append(
            jnp.pad(a.astype(dt), (0, pad_q), constant_values=fill)
            .reshape(-1, LANE)
        )

    n_img = (P + pad_p) // tile_img
    n_pup = (Q + pad_q) // blk

    img_spec_i = pl.BlockSpec(
        (tile_img, 1), lambda i, q: (i, 0), memory_space=pltpu.VMEM
    )
    pup_spec_i = pl.BlockSpec(
        (PUP_ROWS, LANE), lambda i, q: (q, 0), memory_space=pltpu.VMEM
    )
    k_arr = jnp.asarray(jnp.reshape(k, (1,)), dt)

    with mosaic_compile_ctx(interpret):
        # image-coordinate gradients (accumulate over pupil blocks)
        def kern_img(*refs):
            _bwd_img_kernel(
                refs[:3], refs[3:11], refs[11:13], refs[13], refs[14:]
            )

        dimg = pl.pallas_call(
            kern_img,
            grid=(n_img, n_pup),
            in_specs=[img_spec_i] * 3 + [pup_spec_i] * 8
            + [img_spec_i] * 2
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[img_spec_i] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((n_img * tile_img, 1), dt)
            ] * 3,
            interpret=interpret,
        )(*img2, *pup2, *cot2, k_arr)

        # pupil gradients (transposed grid: accumulate over image tiles)
        img_spec_p = pl.BlockSpec(
            (tile_img, 1), lambda p, i: (i, 0), memory_space=pltpu.VMEM
        )
        pup_spec_p = pl.BlockSpec(
            (PUP_ROWS, LANE), lambda p, i: (p, 0), memory_space=pltpu.VMEM
        )

        def kern_pup(*refs):
            _bwd_pup_kernel(
                refs[:3], refs[3:11], refs[11:13], refs[13], refs[14:]
            )

        dpup = pl.pallas_call(
            kern_pup,
            grid=(n_pup, n_img),
            in_specs=[img_spec_p] * 3 + [pup_spec_p] * 8
            + [img_spec_p] * 2
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[pup_spec_p] * 8,
            out_shape=[
                jax.ShapeDtypeStruct((n_pup * PUP_ROWS, LANE), dt)
            ] * 8,
            interpret=interpret,
        )(*img2, *pup2, *cot2, k_arr)

    dimg = tuple(d.ravel()[:P] for d in dimg)
    dpup = tuple(d.ravel()[:Q] for d in dpup)
    return dimg, dpup


def huygens_field_pallas(
    image_x, image_y, image_z,
    pupil_x, pupil_y, pupil_z,
    pupil_amp, pupil_opd_mm,
    wavelength_mm, Rp,
):
    """Drop-in replacement for psf.huygens_fresnel.huygens_field.

    Forward and backward both run Pallas kernels; the adjoint executes the
    VJP of the identical pairwise block inside the kernels, so jax.grad
    through the PSF never materializes the O(P x Q) intermediates in HBM
    (the reference's torch strategy autograds through the same loop,
    reference: psf/huygens_fresnel_strategies.py:175).
    """
    k = 2.0 * jnp.pi / float(wavelength_mm)
    interpret = jax.default_backend() == "cpu"

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

    @jax.jit  # whole-graph compile: keeps the chain ops off the eager path
    def _bwd(args, g):
        ix, iy, iz, px, py, pz, amp, opd = args
        # JAX complex-cotangent convention: zbar = dL/dRe(z) - i dL/dIm(z),
        # so the real-pair cotangents are (Re(g), -Im(g))
        g_re = jnp.real(g)
        g_im = -jnp.imag(g)
        c = jnp.cos(-k * opd)
        s = jnp.sin(-k * opd)
        phase_re = amp * c
        phase_im = amp * s
        nx, ny, nz = px / Rp, py / Rp, pz / Rp
        dimg, dpup = _pallas_field_bwd(
            (ix, iy, iz),
            (px, py, pz, nx, ny, nz, phase_re, phase_im),
            g_re, g_im, k, interpret=interpret,
        )
        dpx_k, dpy_k, dpz_k, dnx, dny, dnz, dpre, dpim = dpup
        # chain the derived pupil arrays back to the primal inputs
        damp = dpre * c + dpim * s
        dopd = k * amp * (dpre * s - dpim * c)
        dpx = dpx_k + dnx / Rp
        dpy = dpy_k + dny / Rp
        dpz = dpz_k + dnz / Rp
        outs = (*dimg, dpx, dpy, dpz, damp, dopd)
        return tuple(o.astype(a.dtype) for o, a in zip(outs, args))

    field.defvjp(_fwd, _bwd)
    return field(
        image_x, image_y, image_z, pupil_x, pupil_y, pupil_z,
        pupil_amp, pupil_opd_mm,
    )


__all__ = ["huygens_field_pallas"]
