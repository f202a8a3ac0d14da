"""Sim -> L1: OpenUniverse truth image to Level-1 MultiAccum ramp cube.

Re-implements the reference's ``from_sim/sim_to_isim.py`` (Image2D,
make_l1_fullcal, fill_in_refdata_and_1f, run_config) with full detector
physics, TPU-native:

- scene/sky/dark charge is drawn as **independent per-read Poisson
  increments** (the Poisson-process decomposition of the reference's
  total-Poisson + sequential binomial apportionment,
  ``romanisim.l1.apportion_counts_to_resultants`` via
  ``sim_to_isim.py:233`` — identical joint distribution, but
  embarrassingly parallel across reads),
- cosmic-ray hits per read interval (Poisson count x log-normal charge),
- reset noise, the IL forward model (IPC convolution + gain +
  24-iteration bisection linearity inverse) applied per resultant,
- read noise /sqrt(N) per group, bias correction, integer rounding,
- reference pixels/1-f banding/amp33 synthesis
  (``fill_in_refdata_and_1f``, ``sim_to_isim.py:306-402``): per-channel
  pink noise with odd-channel mirroring, shared reset noise, dark-cube
  border fill, uint16 clip,
- EXTRACT_REF reference-read subtraction with data_encoding_offset
  (``sim_to_isim.py:711-730``).

RNG is ``jax.random`` (threefry), key-split per (stage, group, read);
statistical parity with the galsim streams is the contract (SURVEY §7).
"""

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .. import pars
from .. import config as cfgmod
from ..config import load_config, reads_to_pattern
from ..dqflags import group as gdq
from ..io import asdf_lite, calfiles, fits_lite
from ..ops import contract_pallas, ipc, ipc_pallas, linearity, pink, ramp, rand, wcsutils
from ..ops import ipc_pallas as ipc_pallas_mod  # the bool kwarg shadows it
from ..utils import skymodel
from .. import __version__

# jitted wrappers for host-driven one-off device calls (eager dispatch
# is unsupported on the axon TPU backend)
_ipc_rev_j = jax.jit(ipc.ipc_rev, static_argnames=("order",))
_lin_cube_j = jax.jit(
    linearity.apply_linearity_cube, static_argnames=("do_not_flag_first",)
)

# Cosmic-ray model: flux [hits/cm^2/s] x pixel area [cm^2], log-normal
# charge.  Tuned to the reference's test envelope of 10k-30k JUMP_DET
# pixels per 4088^2, 139.8 s exposure (test_workflow.py:624-627;
# romanisim's default CR flux is ~8 /cm^2/s with 10 um pixels).
CR_RATE_PER_PIX_S = 8.0 * 1.0e-6  # hits / pixel / s
CR_CHARGE_MU = np.log(1000.0)  # log-normal median 1000 e
CR_CHARGE_SIGMA = 1.0


def read_pattern_to_tij(read_pattern, frame_time=None):
    """Read pattern -> per-read timestamps (romanisim.l1.read_pattern_to_tij)."""
    ft = pars.read_time if frame_time is None else frame_time
    return [[ft * idx for idx in grp] for grp in read_pattern]


class IL:
    """IPC + inverse-linearity forward model (reference
    ``ipc_linearity.IL:398-513``): linearized electrons -> raw DN.

    Holds device arrays; ``apply`` runs jitted.
    """

    def __init__(self, lin, gain, ipc_kernel=None, start_e=0.0,
                 ipc_pallas=False, ipc_kernel_padded=None):
        self.lin = lin  # LinearityData (full frame)
        self.gain = gain  # (ny, nx) full frame
        self.ipc_kernel = ipc_kernel  # (3, 3, na, na) or None
        # optional pre-padded (9, rows_in, width) slab
        # (ipc_pallas.kernel_planes_padded) for the Pallas cube path
        self.ipc_kernel_padded = ipc_kernel_padded
        self.start_e = start_e  # scalar or (na, na) electrons
        self.ipc_pallas = ipc_pallas  # fused Pallas forward stencil

    def apply(self, counts_e):
        """Electrons (active region) -> raw DN (active region).

        Accepts a 2-D frame or a (ngrp, na, na) batch (all device ops
        broadcast over the leading axis)."""
        nb = (self.gain.shape[-1] - counts_e.shape[-1]) // 2
        ny = self.gain.shape[0]
        act = slice(nb, ny - nb) if nb else slice(None)
        x = counts_e + self.start_e
        if self.ipc_kernel is not None or self.ipc_kernel_padded is not None:
            if self.ipc_pallas and x.ndim == 3:
                x = ipc_pallas.ipc_fwd_cube_blocked(
                    x,
                    self.ipc_kernel_padded
                    if self.ipc_kernel_padded is not None
                    else self.ipc_kernel,
                )
            else:
                x = ipc.ipc_fwd(x, self.ipc_kernel)
        lin_act = linearity.LinearityData(
            self.lin.coefs[:, act, act], self.lin.smin[act, act],
            self.lin.smax[act, act], self.lin.sref[act, act],
            self.lin.dq[act, act],
        )
        S, _ = linearity.invert_linearity(x / self.gain[act, act], lin_act)
        return S


def _accumulate_resultants(key, lam_per_read, read_pattern, crparam,
                           contract="dot"):
    """Draw per-read Poisson increments and average cumulative charge
    into resultants.

    lam_per_read : (nreads_total,) relative exposure per frame index
        times the (na, na) rate map -> passed as (na, na) rate in e/frame
        (uniform frame time assumed within the MA table).
    contract : 'dot' (one XLA dot_general), 'pallas'
        (ops.contract_pallas streaming kernel).
    Returns (resultants_e (ngrp, na, na), crhits (ngrp, na, na) int32 —
    hits AFFECTING each resultant, i.e. the hit's group and later ones,
    romanisim's "flag from the jump resultant onward" semantics).
    """
    lastread = read_pattern[-1][-1]
    nreads = lastread + 1
    ngrp = len(read_pattern)
    na = lam_per_read.shape[0]

    # resultant_j = mean_{r in group j} cumsum(inc)_r
    #             = sum_r T[j, r] * inc_r
    # with T[j, r] = (# reads in group j at index >= r) / N_j — the
    # cumulative-membership contraction (cf. galpoisson.find_tilnus).
    # One batched Poisson draw + one MXU matmul replaces the
    # reference's sequential per-read accumulation.
    T = np.zeros((ngrp, nreads), np.float64)
    for j, grp in enumerate(read_pattern):
        for r in grp:
            T[j, : r + 1] += 1.0 / len(grp)
    T[:, 0] = 0.0  # read 0 is at t=0: no charge collected before it
    T_d = jnp.asarray(T, jnp.float32)

    do_cr = crparam is not None
    k_poi, k_hit, k_q, k_dir, k_fr = jax.random.split(key, 5)

    crh = jnp.zeros((ngrp, na, na), jnp.int32)
    if do_cr:
        # CRs as a thinned Poisson point process: hits are ~3e-7 of the
        # pixel-read sites, so instead of dense per-read hit/charge maps
        # (~70 serialized full-frame draws), draw a static-size list of
        # K candidate events, keep the first N ~ Poisson(p*M) of them,
        # and scatter-add the deposits.  The per-site-Bernoulli and
        # uniform-position-list formulations are the same point process
        # (double-hit collisions have probability ~N^2/M and are
        # physically legal anyway).  Track extent: a CR crosses
        # ~3 pixels (romanisim models secant tracks; the reference
        # envelope of 10k-30k flagged pixels per exposure implies
        # multiplicity ~3) — scaled deposits in the two neighbors along
        # a random axis; neighbors falling outside the array are
        # dropped (zero-fill edges).
        p_hit = CR_RATE_PER_PIX_S * crparam.get("frame_time", pars.read_time)
        lam_cr = p_hit * (nreads - 1) * na * na  # read 0 is at t=0
        # static candidate cap at +8 sigma: truncation probability is
        # negligible at any physical rate
        kcap = max(256, int(-(-(lam_cr + 8.0 * lam_cr**0.5 + 8.0) // 256))
                   * 256)
        n_cr = rand.poisson(k_hit, jnp.float32(lam_cr), shape=(1,))[0]
        active = jnp.arange(kcap, dtype=jnp.float32) < n_cr

        rr = jax.random.randint(jax.random.fold_in(k_q, 0), (kcap,),
                                1, nreads)
        yy = jax.random.randint(jax.random.fold_in(k_q, 1), (kcap,), 0, na)
        xx = jax.random.randint(jax.random.fold_in(k_q, 2), (kcap,), 0, na)
        q = jnp.exp(
            CR_CHARGE_MU
            + CR_CHARGE_SIGMA * jax.random.normal(k_dir, (kcap,))
        )
        horiz = jax.random.bernoulli(jax.random.fold_in(k_dir, 1), 0.5,
                                     (kcap,))
        fr = jax.random.uniform(k_fr, (2, kcap), minval=0.3, maxval=1.0)

        dy = jnp.where(horiz, 0, 1)
        dx = jnp.where(horiz, 1, 0)
        # event list: center + two track neighbors
        ev_r = jnp.concatenate([rr, rr, rr])
        ev_y = jnp.concatenate([yy, yy - dy, yy + dy])
        ev_x = jnp.concatenate([xx, xx - dx, xx + dx])
        ev_q = jnp.concatenate([q, q * fr[0], q * fr[1]])
        keep = (
            jnp.concatenate([active] * 3)
            * (ev_y >= 0) * (ev_y < na) * (ev_x >= 0) * (ev_x < na)
        )
        ev_y = jnp.clip(ev_y, 0, na - 1)
        ev_x = jnp.clip(ev_x, 0, na - 1)

    # one (nreads, na, na) draw + one MXU contraction: a single
    # rand.poisson call shares the lam-dependent pmf/PTRS constants
    # across ALL reads (the rate plane is 2-D); splitting the draw into
    # per-chunk calls recomputes them per chunk and measured 2x slower
    # at 4096^2 despite the smaller live set
    incs = rand.poisson(k_poi, lam_per_read, shape=(nreads, na, na))
    if contract == "pallas":
        res = contract_pallas.contract_reads(T_d, incs)
    else:
        res = jnp.einsum(
            "jr,ryx->jyx", T_d, incs, preferred_element_type=jnp.float32
        )
    if do_cr:
        # deposit CRs in the RESULTANT domain: a hit at read r adds q
        # to every cumsum at reads >= r, so its per-resultant weight is
        # exactly T[j, r] (the cumulative-membership column).  This
        # keeps the Poisson cube (nreads planes, ~1 GB at 4096^2) out
        # of the scatter entirely — the scatter target shrinks to the
        # (ngrp, na, na) output and the event count is unchanged.
        # One single-plane scatter PER RESULTANT with scalar updates:
        # a combined scatter with (ngrp,)-column updates touches ngrp
        # HBM locations ~67 MB apart per event row and measured ~21 ms
        # at 4096^2/21k events on v5e; per-plane scalar scatters are
        # ~3 ms total (windowed (ngrp,3,3)-patch rows are worst, ~34).
        # w[j, e] = T[j, r_e] via a one-hot matmul (the event list is
        # ~21k rows; a gather would also serialize on TPU).
        onehot_r = (
            ev_r[:, None] == jnp.arange(nreads, dtype=ev_r.dtype)[None]
        ).astype(jnp.float32)
        w = jax.lax.dot_general(
            T_d, onehot_r, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (ngrp, nev)
        wq = w * (ev_q * keep)[None]
        res = jnp.stack(
            [res[j].at[ev_y, ev_x].add(wq[j]) for j in range(ngrp)]
        )
        # T[j, r_e] > 0 exactly when the hit at read r_e changes
        # resultant j (its group or a later one) — per-group hit maps
        # give romanisim's from-the-jump-onward flagging, not a
        # whole-ramp flag
        hitw = ((w > 0) & keep[None]).astype(jnp.int32)
        crh = jnp.stack(
            [crh[j].at[ev_y, ev_x].add(hitw[j]) for j in range(ngrp)]
        )
    return res, crh


_SIM_CORE_CACHE = {}


def _l1_core_factory(read_pattern, ft, has_biascorr, has_ipc, do_cr,
                     ipc_pallas=False, contract="dot"):
    """Cached jitted L1-synthesis core (arrays passed as arguments —
    closing over full-frame constants breaks the axon remote compile,
    and eager dispatch is unsupported on that backend)."""
    key_t = (tuple(tuple(g) for g in read_pattern), ft, has_biascorr,
             has_ipc, do_cr, ipc_pallas, contract)
    if key_t in _SIM_CORE_CACHE:
        return _SIM_CORE_CACHE[key_t]

    ngrp = len(read_pattern)
    nvec = np.asarray([len(g) for g in read_pattern], np.float32)

    @jax.jit
    def core(key, rate_e, arrs):
        na = rate_e.shape[0]
        k_reset, k_app, k_read = jax.random.split(key, 3)

        gain_act = arrs["gain_act"]
        # reset noise in electrons (sim_to_isim.py:194-215)
        reset_e = (
            jax.random.normal(k_reset, (na, na))
            * arrs["resetnoise_act"] * gain_act
        )
        if has_biascorr:
            reset_e = reset_e - (
                arrs["biascorr_t0"] * arrs["dark_slope_act"] / gain_act
            )

        lin = linearity.LinearityData(
            arrs["lin_coefs"], arrs["lin_smin"], arrs["lin_smax"],
            arrs["lin_sref"], arrs["lin_dq"],
        )
        il = IL(
            lin, arrs["gain"],
            arrs.get("ipc_kernel") if has_ipc else None, start_e=reset_e,
            ipc_pallas=ipc_pallas,
            ipc_kernel_padded=(
                arrs.get("ipc_kernel_padded")
                if has_ipc and ipc_pallas else None
            ),
        )

        lam_per_frame = jnp.clip(rate_e * ft, 0.0, None)
        res_e, crhits = _accumulate_resultants(
            k_app, lam_per_frame, read_pattern,
            {"frame_time": ft} if do_cr else None, contract=contract,
        )

        # IL forward model, batched over resultants (electrons -> raw DN)
        resultants = il.apply(res_e)

        # read noise / sqrt(N_j) (add_read_noise_to_resultants);
        # bf16 normals halve the erfinv-dominated draw cost, quantizing
        # the NOISE value at ~2^-8 relative (~0.02 DN for sigma~6 DN,
        # on resultants rounded to integer DN right after)
        rn = (
            jax.random.normal(k_read, (ngrp, na, na), dtype=jnp.bfloat16
                              ).astype(jnp.float32)
            * arrs["read_sigma_act"][None]
            / jnp.sqrt(jnp.asarray(nvec))[:, None, None]
        )
        resultants = resultants + rn
        if has_biascorr:
            resultants = resultants + arrs["biascorr"]
        resultants = jnp.round(resultants)

        # dq: JUMP_DET on the resultants a CR affects (its group and
        # later), plus the linearity cal file's per-pixel dq copied
        # into every group (reference IL.set_dq,
        # ``ipc_linearity.py:438-459``)
        dq = jnp.where(
            crhits > 0, jnp.uint32(gdq.JUMP_DET), jnp.uint32(0)
        )
        nside_l = arrs["lin_dq"].shape[0]
        nb_l = (nside_l - na) // 2
        dq = dq | arrs["lin_dq"][
            nb_l : nside_l - nb_l, nb_l : nside_l - nb_l
        ].astype(jnp.uint32)[None]
        return resultants, dq

    _SIM_CORE_CACHE[key_t] = core
    return core


def make_l1_fullcal(key, counts_rate_e, read_pattern, pack, frame_time=None,
                    crparam=None, persistence=None, ipc_pallas=False,
                    contract="dot"):
    """Counts rate (e/s, active region) -> L1 resultants in raw DN.

    Mirrors reference ``make_l1_fullcal`` (``sim_to_isim.py:163-262``):
    reset noise, per-resultant IL forward model, read noise, biascorr,
    rounding.  Returns (resultants_DN (ngrp, na, na) float32,
    resultantdq (ngrp, na, na) uint32).

    ``persistence`` is an optional (na, na) charge rate in e/s from
    prior exposures, added to the per-pixel rate before the Poisson
    draw.  The reference threads a ``romanisim.persistence.Persistence``
    object through the same call (``sim_to_isim.py:676-691``, always a
    fresh/empty one so zero physics there too); here the hook takes the
    evaluated rate image directly — host metadata stays on the host.
    """
    if persistence is not None:
        counts_rate_e = jnp.asarray(counts_rate_e, jnp.float32) + jnp.asarray(
            persistence, jnp.float32
        )
    ft = pars.read_time if frame_time is None else frame_time
    nside = pack.gain.shape[0]
    na = counts_rate_e.shape[0]
    nb = (nside - na) // 2
    act = slice(nb, nside - nb)
    ngrp = len(read_pattern)

    arrs = {
        "gain": pack.gain,
        "gain_act": pack.gain[act, act],
        "resetnoise_act": pack.resetnoise[act, act],
        "read_sigma_act": pack.read_sigma[act, act],
        "dark_slope_act": pack.dark_slope[act, act],
        "lin_coefs": pack.lin_coefs,
        "lin_smin": pack.lin_smin,
        "lin_smax": pack.lin_smax,
        "lin_sref": pack.lin_sref,
        "lin_dq": pack.lin_dq,
        "biascorr_t0": np.float32(pack.biascorr_t0),
    }
    # only stage what the traced core reads (gated by has_ipc /
    # has_biascorr in the factory key) — full-frame zero dummies would
    # memset ~1 GB of host RAM per call for nothing
    if pack.ipc_kernel is not None:
        arrs["ipc_kernel"] = pack.ipc_kernel
    if pack.biascorr is not None:
        arrs["biascorr"] = pack.biascorr[pack.biascorr.shape[0] - ngrp:]
    if ipc_pallas and pack.ipc_kernel is not None:
        arrs["ipc_kernel_padded"] = ipc_pallas_mod.kernel_planes_padded(
            pack.ipc_kernel, th=32
        )
    core = _l1_core_factory(
        read_pattern, float(ft), pack.biascorr is not None,
        pack.ipc_kernel is not None, crparam is not None,
        ipc_pallas=ipc_pallas, contract=contract,
    )
    return core(key, jnp.asarray(counts_rate_e, jnp.float32), arrs)


def fill_in_refdata_and_1f(key, im, pack, read_pattern, nside, channelwidth,
                           fill_in_banding=True, amp33=None, nborder=4,
                           pink_pallas=False):
    """Fill reference pixels and add 1/f banding + amp33 (device).

    Mirrors reference ``fill_in_refdata_and_1f`` (``sim_to_isim.py:306-402``):
    the full frame starts as a synthetic dark (white read noise /sqrt(N)
    + shared reset noise + dark cube), the active region is overwritten
    with ``im``, then per-group banding is added: a common 1/f frame
    (C_PINK) plus per-channel unique frames (U_PINK), odd channels
    mirrored; the amp33 block gets median + white*std + RU_PINK*own-pink
    + M_PINK*common.  Output clipped/rounded to uint16.

    Returns (im_u16 (ngrp, nside, nside), amp33_u16 or None).
    """
    ngrp = im.shape[0]
    im_is_active = im.shape[-1] != nside
    do_amp33 = amp33 is not None and pack.amp33_valid
    de = pack.dark_cube.shape[0] - ngrp
    arrs = {
        "im": im,
        "read_sigma": pack.read_sigma,
        "resetnoise": pack.resetnoise,
        "dark_cube": pack.dark_cube[de:],
        "amp33_med": (
            pack.amp33_med if pack.amp33_med is not None
            else np.zeros((nside, channelwidth), np.float32)
        ),
        "amp33_std": (
            pack.amp33_std if pack.amp33_std is not None
            else np.zeros((nside, channelwidth), np.float32)
        ),
        "c_pink": np.float32(pack.c_pink),
        "u_pink": np.float32(pack.u_pink),
        "m_pink": np.float32(pack.amp33_m_pink),
        "ru_pink": np.float32(pack.amp33_ru_pink),
    }
    nvec = tuple(len(g) for g in read_pattern)
    core = _fill_core_factory(
        nvec, nside, channelwidth, nborder, bool(fill_in_banding),
        bool(do_amp33), im_is_active, pink_pallas=bool(pink_pallas),
    )
    im_u16, amp33_u16 = core(key, arrs)
    return im_u16, (amp33_u16 if do_amp33 else None)


_FILL_CORE_CACHE = {}


def _fill_core_factory(nvec, nside, channelwidth, nborder, fill_in_banding,
                       do_amp33, im_is_active=False, pink_pallas=False):
    """The pink-noise amplitudes (``c_pink``/``u_pink``/``m_pink``/
    ``ru_pink``) are RUNTIME scalars in ``arrs``, not factory
    constants: they come from each SCA's ``read`` calibration file, so
    baking them into the compiled program would force one fill-core
    (remote) compile per detector and fragment mixed-SCA focal-plane
    batches into per-SCA machinery groups.

    ``pink_pallas``: route the 1/f synthesis through the fused TPU
    kernel (``ops.pink_pallas``) instead of the XLA matmul pipeline
    (cfg key ``pink_pallas``, same pattern as ``ipc_pallas``)."""
    key_t = (nvec, nside, channelwidth, nborder, fill_in_banding, do_amp33,
             im_is_active, pink_pallas)
    if key_t in _FILL_CORE_CACHE:
        return _FILL_CORE_CACHE[key_t]

    ngrp = len(nvec)
    nb = nborder
    nch = nside // channelwidth
    nvec_np = np.asarray(nvec, np.float32)

    @jax.jit
    def core(key, arrs):
        k_white, k_reset, k_pink, k_a33 = jax.random.split(key, 4)

        # The synthetic-dark noise (white/sqrt(N) + shared reset + dark
        # ramp) only survives on the 4-pixel reference border — the
        # active region is overwritten by the science data — so it is
        # drawn per border STRIP, not per full frame (at 4096^2 a
        # full-frame draw wastes ~100M normals, ~99.6% of the RNG).
        sq = jnp.sqrt(jnp.asarray(nvec_np))[:, None, None]

        def strip(kk, sl_y, sl_x, shape):
            w = jax.random.normal(jax.random.fold_in(k_white, kk), shape)
            r = jax.random.normal(
                jax.random.fold_in(k_reset, kk), shape[1:]
            )
            return (
                w * arrs["read_sigma"][sl_y, sl_x][None] / sq
                + (r * arrs["resetnoise"][sl_y, sl_x])[None]
                + arrs["dark_cube"][:, sl_y, sl_x]
            )

        mid_y = slice(nb, nside - nb)
        bot = strip(0, slice(0, nb), slice(None), (ngrp, nb, nside))
        top = strip(1, slice(nside - nb, nside), slice(None),
                    (ngrp, nb, nside))
        left = strip(2, mid_y, slice(0, nb), (ngrp, nside - 2 * nb, nb))
        right = strip(3, mid_y, slice(nside - nb, nside),
                      (ngrp, nside - 2 * nb, nb))

        src = (
            arrs["im"] if im_is_active
            else arrs["im"][:, nb:-nb, nb:-nb]
        ).astype(jnp.float32)
        noise = jnp.concatenate(
            [bot, jnp.concatenate([left, src, right], axis=2), top], axis=1
        )

        amp33_out = jnp.zeros((ngrp, nside, channelwidth), jnp.uint16)
        if fill_in_banding:
            # frames: per group, 1 common + nch unique (+1 amp33)
            per_grp = 1 + nch + (1 if do_amp33 else 0)
            frames = pink.pink_frames(
                k_pink, ngrp * per_grp, nside, channelwidth,
                pallas=pink_pallas,
            )
            frames = frames.reshape(ngrp, per_grp, nside, channelwidth)
            common = frames[:, 0] * arrs["c_pink"]
            uniq = frames[:, 1 : 1 + nch] * arrs["u_pink"]  # (ngrp, nch, ns, cw)
            # odd channels are read in the reverse x direction: the
            # WHOLE per-channel band (unique + common) is mirrored, as
            # in the reference (``sim_to_isim.py:384-386``).  A pink
            # frame is a row-major reshape of one contiguous 1/f
            # stream, so its covariance is R(|cw*dr + dc|) — flipping
            # changes the cross-row orientation to R(|cw*dr - dc|),
            # which for 1/f noise is NOT a distributional no-op (an
            # earlier round flipped only the common frame; that left
            # odd channels' unique-noise covariance un-mirrored).
            flip = jnp.arange(nch) % 2 == 1
            band = uniq + common[:, None]
            band = jnp.where(
                flip[None, :, None, None], band[..., ::-1], band
            )
            band = band / jnp.sqrt(jnp.asarray(nvec_np))[:, None, None, None]
            band = band.transpose(0, 2, 1, 3).reshape(ngrp, nside, nside)
            noise = noise + band

            if do_amp33:
                white = (
                    jax.random.normal(k_a33, (ngrp, nside, channelwidth))
                    * arrs["amp33_std"][None]
                )
                pinkref = (
                    arrs["ru_pink"] * frames[:, -1]
                    + arrs["m_pink"] * common
                )
                a33 = arrs["amp33_med"][None] + (
                    white + pinkref
                ) / jnp.sqrt(jnp.asarray(nvec_np))[:, None, None]
                amp33_out = jnp.clip(jnp.round(a33), 0, 65535).astype(
                    jnp.uint16
                )

        im_u16 = jnp.clip(jnp.round(noise), 0, 2**16 - 1).astype(jnp.uint16)
        return im_u16, amp33_out

    _FILL_CORE_CACHE[key_t] = core
    return core


class Image2D:
    """2-D truth image with WCS and metadata (reference ``Image2D:405``)."""

    def __init__(self, intype, **kwargs):
        if intype == "anlsim":
            self.init_anlsim(kwargs["fname"])
        else:
            raise ValueError(f"unknown input type {intype!r}")

    def init_anlsim(self, fname, flip=True):
        m = re.search(r"_(\d+)_(\d+)\.fits", fname)
        if m is None:
            raise ValueError(
                "anlsim input filename must end in _<obsid>_<sca>.fits "
                f"(e.g. truth_F184_163_4.fits); got {fname!r}"
            )
        self.idsca = (int(m.group(1)), int(m.group(2)))
        hdus = fits_lite.open_fits(fname)
        data = np.array(hdus[0].data, dtype=np.float64)
        self.header = hdus[0].header
        if flip:
            if self.idsca[1] % 3 == 0:
                wcsutils.sip_hflip(data, self.header)
            else:
                wcsutils.sip_vflip(data, self.header)
        self.image = data / float(self.header["EXPTIME"])  # e/s
        # FITS (1-based) -> 0-based pixel convention
        self.header["CRPIX1"] = self.header["CRPIX1"] - 1
        self.header["CRPIX2"] = self.header["CRPIX2"] - 1
        self.wcs = wcsutils.SIPWCS.from_header(self.header, zero_based=True)
        date = self.header.get("DATE-OBS", "2025-01-01 00:00:00")
        self.date = re.sub(" ", "T", str(date)) + "Z"
        self.filter = str(self.header["FILTER"])[:4]
        self.ra_ = float(self.header["RA_TARG"])
        self.dec_ = float(self.header["DEC_TARG"])
        self.pa_ = float(self.header["PA_OBSY"])

    def simulate(self, use_read_pattern, caldir=None, config=None, seed=43,
                 sky_rate=0.4, frame_time=None, persistence=None):
        """L1 (and idealized L2 inputs) simulation.

        Follows reference ``Image2D.simulate`` (``sim_to_isim.py:520-791``)
        with the romanisim blank-image step replaced by an explicit
        sky+dark Poisson rate (``sky_rate`` e/s/pix scaled by the flat).
        ``persistence``: optional (na, na) prior-exposure charge rate in
        e/s, forwarded to ``make_l1_fullcal`` (reference threads a
        Persistence object the same way, ``sim_to_isim.py:581,676``).
        """
        config = config or {}
        if caldir is None:
            raise ValueError(
                "caldir=None (romanisim internal defaults) is not supported; "
                "use synth.make_cal_files for a self-contained cal set"
            )
        pack = calfiles.load_caldir_cached(
            {k: v for k, v in caldir.items() if k != "NO_AMP33"}
        )
        ft = pars.read_time if frame_time is None else frame_time
        nside = pack.nside
        nb = pars.nborder
        na = nside - 2 * nb
        act = slice(nb, nside - nb)
        key = rand.sim_key(seed)
        # 3-way split kept for stream stability (slot 0 was an earlier
        # counts stream, now folded into the L1 core's own splits)
        _, k_l1, k_fill = jax.random.split(key, 3)

        # cal preparation (sim_to_isim.py:615-662)
        gain_act = pack.gain[act, act]
        dark_e = pack.dark_slope[act, act] * gain_act  # e/s
        flat = pack.flat[act, act]
        if pack.ipc_kernel is not None:
            dark_e = np.asarray(
                _ipc_rev_j(jnp.asarray(dark_e), jnp.asarray(pack.ipc_kernel))
            )
            flat = np.asarray(
                _ipc_rev_j(
                    jnp.asarray(flat), jnp.asarray(pack.ipc_kernel),
                    gain=jnp.asarray(gain_act),
                )
            )
            flat = np.clip(flat, 0.0, 2 - 2**-21)
            dark_e = np.clip(dark_e, -0.1 * flat, None)

        area = wcsutils.pixelarea(self.wcs, N=na)
        flat_witharea = flat / (area / pars.Omega_ideal)
        C = float(config.get("CNORM", 1.0))

        # total charge rate in e/s: scene (through flat+area+gain norm)
        # + sky (through flat) + dark
        scene_rate = (
            C * pack.gain[act, act] / pars.g_ideal * self.image * flat_witharea
        )
        rate_e = np.clip(scene_rate + sky_rate * flat + dark_e, 0.0, None)

        # L1 synthesis
        resultants, l1dq = make_l1_fullcal(
            k_l1, jnp.asarray(rate_e, jnp.float32), use_read_pattern, pack,
            frame_time=ft, crparam={}, persistence=persistence,
            ipc_pallas=(
                cfgmod.resolve_backend(config, "IPC_BACKEND")
                in ("pallas", "pallas-stream")
            ),
            contract={"auto": "dot"}.get(
                str(config.get("CONTRACT_BACKEND", "dot")).lower(),
                str(config.get("CONTRACT_BACKEND", "dot")).lower()),
        )

        no_amp33 = bool(caldir.get("NO_AMP33", False))
        cw = pack.amp33_med.shape[1] if pack.amp33_valid else max(nside // 32, 4)
        im_u16, amp33_u16 = fill_in_refdata_and_1f(
            k_fill, resultants, pack, use_read_pattern, nside, cw,
            fill_in_banding=True,
            amp33=(np.zeros(1) if (pack.amp33_valid and not no_amp33) else None),
            nborder=nb,
            pink_pallas=(
                cfgmod.resolve_backend(config, "PINK_BACKEND") == "pallas"
            ),
        )
        im_u16 = np.asarray(im_u16)
        amp33_u16 = np.asarray(amp33_u16) if amp33_u16 is not None else None

        l1tree = {
            "meta": {
                "exposure": {
                    "read_pattern": [list(g) for g in use_read_pattern],
                    "frame_time": ft,
                    "nresultants": len(use_read_pattern),
                    "start_time": self.date,
                    "exposure_time": ft
                    * (use_read_pattern[-1][-1] - use_read_pattern[0][0]),
                },
                "instrument": {
                    "detector": f"WFI{self.idsca[1]:02d}",
                    "optical_element": "F" + self.filter[1:],
                },
                "pointing": {
                    "ra": self.ra_, "dec": self.dec_, "pa": self.pa_,
                },
                # SIP cards of the science-frame WCS (the reference
                # stamps pointing+wcsinfo into the L1 meta via romanisim
                # util.update_pointing_and_wcsinfo_metadata,
                # sim_to_isim.py:647); the sidecar text file remains the
                # parity surface for L1->L2
                "wcsinfo": dict(
                    self.wcs.to_cards(),
                    pixel_convention="0-based, active region",
                ),
            },
            "data": im_u16,
            "resultantdq": np.asarray(l1dq),
        }
        if amp33_u16 is not None:
            l1tree["amp33"] = amp33_u16

        # EXTRACT_REF: move the reference read out of the cube
        if "EXTRACT_REF" in config:
            off = int(config["EXTRACT_REF"].get("data_encoding_offset", 0))
            nres = l1tree["meta"]["exposure"]["nresultants"]
            l1tree["meta"]["instrument"]["data_encoding_offset"] = off
            l1tree["meta"]["exposure"]["read_pattern"] = l1tree["meta"][
                "exposure"
            ]["read_pattern"][1:]
            l1tree["meta"]["exposure"]["nresultants"] = nres - 1
            l1tree["reference_read"] = l1tree["data"][0].copy()
            modref = l1tree["data"][0].astype(np.int32) - off
            newdata = np.clip(
                l1tree["data"][1:].astype(np.int32) - modref[None], 0, 65535
            ).astype(np.uint16)
            l1tree["data"] = newdata
            l1tree["resultantdq"] = l1tree["resultantdq"][1:]
            if amp33_u16 is not None:
                l1tree["reference_amp33"] = l1tree["amp33"][0].copy()
                modref = l1tree["amp33"][0].astype(np.int32) - off
                l1tree["amp33"] = np.clip(
                    l1tree["amp33"][1:].astype(np.int32) - modref[None],
                    0, 65535,
                ).astype(np.uint16)

        self.af = asdf_lite.AsdfFile(
            {
                "roman": l1tree,
                "romanimpreprocess_tpu": {"version": __version__},
            }
        )
        self.truth_rate = rate_e  # for validation
        # kept for make_ideal_l2: the reference's af2 is built from the
        # PRE-fill float cube (``sim_to_isim.py:745-754``) — before
        # banding noise, uint16 rounding, and EXTRACT_REF reshuffling
        # (which offset-shifts the DN the linearity inversion sees)
        self._resultants_prefill = np.asarray(resultants, np.float32)
        self._read_pattern_sim = [list(g) for g in use_read_pattern]

    def L1_write_to(self, filename):
        if hasattr(self, "af"):
            self.af.write_to(filename)
            return True
        return False

    def make_ideal_l2(self, caldir, u=0.4 / 1.8 / 6.5**2):
        """Idealized L2 from the in-memory L1 (the reference's ``af2``
        from ``romanisim.image.make_l2``, ``sim_to_isim.py:745-789``):
        linearity-corrected Casertano slope, dark and flat removed, no
        jump machinery."""
        pack = calfiles.load_caldir_cached(
            {k: v for k, v in caldir.items() if k != "NO_AMP33"}
        )
        l1 = self.af["roman"]
        nb = pars.nborder
        nside = pack.nside
        act = slice(nb, nside - nb)
        ft = float(l1["meta"]["exposure"]["frame_time"])
        if hasattr(self, "_resultants_prefill"):
            # simulated in this process: use the PRE-fill float cube
            # (reference af2 semantics) with the full sim read pattern
            # — the file cube has banding + uint16 rounding and, under
            # EXTRACT_REF, per-pixel offset-shifted DN that would bias
            # the nonlinear inversion
            cube = jnp.asarray(self._resultants_prefill)
            read_pattern = self._read_pattern_sim
            lin = linearity.LinearityData(
                jnp.asarray(pack.lin_coefs[:, act, act]),
                jnp.asarray(pack.lin_smin[act, act]),
                jnp.asarray(pack.lin_smax[act, act]),
                jnp.asarray(pack.lin_sref[act, act]),
                jnp.asarray(pack.lin_dq[act, act]),
            )
            out_act = slice(None)  # cube already active-region
        else:
            cube = jnp.asarray(np.asarray(l1["data"], np.float32))
            read_pattern = [
                list(g) for g in l1["meta"]["exposure"]["read_pattern"]
            ]
            lin = linearity.LinearityData(
                jnp.asarray(pack.lin_coefs), jnp.asarray(pack.lin_smin),
                jnp.asarray(pack.lin_smax), jnp.asarray(pack.lin_sref),
                jnp.asarray(pack.lin_dq),
            )
            out_act = act
        meta = ramp.ma_table_meta(read_pattern, ft)
        exclude_first = read_pattern[0] == [0]
        lin_cube, _ = _lin_cube_j(
            cube, lin, do_not_flag_first=exclude_first,
        )
        K = ramp.casertano_weights(u, meta, exclude_first)
        slope = np.einsum("t,tij->ij", K, np.asarray(lin_cube))
        slope = slope[out_act, out_act] - pack.dark_slope[act, act]
        slope = slope / np.clip(pack.flat[act, act], 0.1, 10.0)
        self.af2 = asdf_lite.AsdfFile(
            {
                "roman": {
                    "meta": dict(l1["meta"]),
                    "data": slope.astype(np.float32),
                    "dq": (
                        # resultantdq is stored at active-region geometry
                        np.bitwise_or.reduce(
                            np.asarray(l1["resultantdq"], np.uint32), axis=0
                        )
                        if "resultantdq" in l1
                        else np.zeros(slope.shape, np.uint32)
                    ),
                },
                "romanimpreprocess_tpu": {"version": __version__},
            }
        )
        return self.af2

    def L2_write_to(self, filename):
        """Write the idealized L2 (build it first with make_ideal_l2)."""
        if hasattr(self, "af2"):
            from ..utils import typefix

            typefix.fix(self.af2.tree)
            self.af2.write_to(filename)
            return True
        return False


class Image2D_from_L1(Image2D):
    """Shortcut workflow: a 2-D image constructed from an L1 data file
    (reference ``Image2D_from_L1:837-944``).  For production use the
    full ``l1_to_l2`` pipeline; this is the idealized pass-through.
    """

    def __init__(self, infile, caldir, thewcs=None):
        self.af = asdf_lite.open(infile)
        self.caldir = caldir
        self.thewcs = thewcs

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def pseudocalibrate(self, u=0.4 / 1.8 / 6.5**2):
        """Idealized L2: linearity-corrected Casertano slope fit, no
        reference-pixel/IPC/jump machinery (the romanisim ``make_l2``
        analog used by the reference's shortcut path).
        """
        if self.thewcs is not None and not isinstance(
            self.thewcs, fits_lite.Header
        ):
            raise ValueError("Unrecognized WCS")
        pack = calfiles.load_caldir(self.caldir)
        l1 = self.af["roman"]
        nb = pars.nborder
        nside = pack.nside
        act = slice(nb, nside - nb)
        data = np.asarray(l1["data"], np.float32)
        read_pattern = [list(g) for g in l1["meta"]["exposure"]["read_pattern"]]
        ft = float(l1["meta"]["exposure"].get("frame_time", pars.read_time))
        meta = ramp.ma_table_meta(read_pattern, ft)
        exclude_first = read_pattern[0] == [0]

        lin = linearity.LinearityData(
            jnp.asarray(pack.lin_coefs), jnp.asarray(pack.lin_smin),
            jnp.asarray(pack.lin_smax), jnp.asarray(pack.lin_sref),
            jnp.asarray(pack.lin_dq),
        )
        lin_cube, _ = _lin_cube_j(
            jnp.asarray(data), lin, do_not_flag_first=exclude_first
        )
        K = ramp.casertano_weights(u, meta, exclude_first)
        slope = np.einsum("t,tij->ij", K, np.asarray(lin_cube))
        slope = slope[act, act] - pack.dark_slope[act, act]
        flat = np.clip(pack.flat[act, act], 0.1, 10.0)
        slope = slope / flat

        self.af2 = asdf_lite.AsdfFile(
            {
                "roman": {
                    "meta": dict(l1["meta"]),
                    "data": slope.astype(np.float32),
                    "dq": np.zeros(slope.shape, np.uint32),
                },
                "romanimpreprocess_tpu": {"version": __version__},
            }
        )
        return self.af2


def run_config(config):
    """Config-driven sim -> L1 (reference ``run_config:947-997``).

    Writes the L1 ASDF, the FITS-WCS sidecar header, and optionally a
    FITS viewing copy with the amp33 block appended.
    """
    caldir = config.get("CALDIR", None)
    use_read_pattern = reads_to_pattern(config["READS"])
    seed = int(config.get("SEED", 43))

    # optional prior-exposure persistence rate image (e/s), FITS file
    # (analog of the Persistence threading in sim_to_isim.py:924-928)
    persistence = None
    if config.get("PERSISTENCE"):
        persistence = np.asarray(
            fits_lite.open_fits(config["PERSISTENCE"])[0].data, np.float32
        )

    x = Image2D("anlsim", fname=config["IN"])
    # sky background: metadata-driven by default (filter + pointing +
    # date zodiacal model + thermal floor, like romanisim's
    # simulate_counts background path, reference sim_to_isim.py:596,637);
    # SKY_RATE overrides with an explicit e/s/pix scalar
    if "SKY_RATE" in config:
        sky_rate = float(config["SKY_RATE"])
    else:
        sky_rate = skymodel.sky_background_rate(
            x.filter, x.ra_, x.dec_, x.date
        )
    x.simulate(
        use_read_pattern, caldir=caldir, config=config, seed=seed,
        sky_rate=sky_rate,
        frame_time=config.get("FRAME_TIME"),
        persistence=persistence,
    )
    x.L1_write_to(config["OUT"])

    # WCS sidecar (FITS-card text; CRPIX already 0-based per Image2D)
    hdr = x.header.copy()
    hdr["COMMENT"] = "truth wcs from sim_to_l1"
    hdr.tofile(config["OUT"][:-5] + "_asdf_wcshead.txt", overwrite=True)

    if config.get("FITSOUT", False):
        f = asdf_lite.open(config["OUT"])
        data = np.asarray(f["roman"]["data"])
        ng2, ns = data.shape[0], data.shape[1]
        if "amp33" in f["roman"]:
            a33 = np.asarray(f["roman"]["amp33"])
            out = np.zeros((ng2, ns, ns + a33.shape[-1]), np.uint16)
            out[:, :, :ns] = data
            out[:, :, ns:] = a33
        else:
            out = data
        fits_lite.PrimaryHDU(out).writeto(
            config["OUT"][:-5] + "_asdf_to.fits", overwrite=True
        )
    return x


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    run_config(load_config(argv[0]))


if __name__ == "__main__":
    main()
