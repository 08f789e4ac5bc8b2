"""Single-source block algebra for the fused fixed-rank AMEn engines.

``solvers/fused.py`` (jitted XLA device programs) and
``solvers/fused_host.py`` (numpy/LAPACK with cached opt_einsum plans) run
the SAME algorithm — fixed bond rank R, Schur-elimination local KKT
solves, AMEn z-train enrichment, Petrov-Galerkin phi interface updates —
on two execution substrates.  Round 4 hand-mirrored the algebra
function-for-function in both files; the round-4 verdict flagged the
drift risk (every numeric fix must land twice).  This module is the one
source: ``make_algebra`` builds the index-contraction layer and
``make_sweep_steps`` the per-core sweep steps, each closed over a backend
(einsum implementation + array namespace + factorization kernels), and
the two engine modules bind their module-level names from the factories.

Deliberately NOT unified (engine-specific for documented reasons):
  * ``_solve_local`` / ``_dense_factor`` / ``_dense_apply`` — the host
    uses LAPACK LU + Python exceptions, the device engine Householder QR
    (TPU XLA has no f64 LU) + NaN-poisoning total-function recovery, and
    the mixed-precision modes differ (fused.py:202-356 rationale).
  * the sweep drivers — ``lax``-friendly unrolled program vs Python loop.
  * the global residual — f64 accumulation vs traced dtype selection.

Reference algorithm: /root/reference/src/tt_als.py:277-741 (sweeps,
enrichment, column scaling) + src/tt_ipm.py:183-401 (local solves).
"""

from __future__ import annotations

from types import SimpleNamespace


def make_algebra(es, xp, keys, nrows):
    """Backend-closed contraction layer.

    ``es``: einsum callable (jnp.einsum / cached host_einsum);
    ``xp``: array namespace (jnp / np);
    ``keys(ineq)``: operator block keys; ``nrows(ineq)``: block rows.
    """
    TINY = 1e-300

    def apply(p_l, a, p_r, v):
        return es("lsr,smnS,LSR,rnR->lmL", p_l, a, p_r, v)

    def apply_T(p_l, a, p_r, v):
        return es("lsr,smnS,LSR,lmL->rnR", p_l, a, p_r, v)

    def proj(p_l, a, p_r):
        m = p_l.shape[0] * a.shape[1] * p_r.shape[0]
        return es("lsr,smnS,LSR->lmLrnR", p_l, a, p_r).reshape(m, m)

    def local_product(pl, A, pr, x, ineq):
        """K @ x in the projected basis; x: (rl, bs, n, rr)."""
        y0 = apply(pl["00"], A["00"], pr["00"], x[:, 0]) + apply(
            pl["01"], A["01"], pr["01"], x[:, 1]
        )
        y1 = apply_T(pl["01"], A["01"], pr["01"], x[:, 0]) + apply(
            pl["12"], A["12"], pr["12"], x[:, 2]
        )
        y2 = apply(pl["21"], A["21"], pr["21"], x[:, 1]) + apply(
            pl["22"], A["22"], pr["22"], x[:, 2]
        )
        if not ineq:
            return xp.stack([y0, y1, y2], axis=1)
        y1 = y1 + apply(pl["12"], A["12"], pr["12"], x[:, 3])  # alias (1,3)
        y3 = apply(pl["31"], A["31"], pr["31"], x[:, 1]) + apply(
            pl["33"], A["33"], pr["33"], x[:, 3]
        )
        return xp.stack([y0, y1, y2, y3], axis=1)

    def z_product(zl, A, zr, x, ineq):
        """K @ x projected with z-bases on the left AND right (ZAX phis
        carry shape (rz, rA, rz): both x-slots replaced).  Mirrors
        blocks.py::compressed_block_local_product."""
        y0 = apply(zl["00"], A["00"], zr["00"], x[:, 0]) + apply(
            zl["01"], A["01"], zr["01"], x[:, 1]
        )
        y1 = es(
            "lsr,snmS,LSR,rnR->lmL", zl["10"], A["01"], zr["10"], x[:, 0]
        ) + apply(zl["12"], A["12"], zr["12"], x[:, 2])
        y2 = apply(zl["21"], A["21"], zr["21"], x[:, 1]) + apply(
            zl["22"], A["22"], zr["22"], x[:, 2]
        )
        if not ineq:
            return xp.stack([y0, y1, y2], axis=1)
        y1 = y1 + apply(zl["12"], A["12"], zr["12"], x[:, 3])
        y3 = apply(zl["31"], A["31"], zr["31"], x[:, 1]) + apply(
            zl["33"], A["33"], zr["33"], x[:, 3]
        )
        return xp.stack([y0, y1, y2, y3], axis=1)

    def mixed_product(ml, mr, A, x, ineq, transpose_right_phi):
        """K @ x with mixed bases (z on one side, x on the other);
        blocks.py::l/rcompressed_block_local_product semantics including
        the reversed outer indices on the transpose row."""
        y0 = apply(ml["00"], A["00"], mr["00"], x[:, 0]) + apply(
            ml["01"], A["01"], mr["01"], x[:, 1]
        )
        if transpose_right_phi:
            y1_t = es(
                "rsl,snmS,LSR,rnR->lmL", ml["01"], A["01"], mr["10"], x[:, 0]
            )
        else:
            y1_t = es(
                "lsr,snmS,RSL,rnR->lmL", ml["10"], A["01"], mr["01"], x[:, 0]
            )
        y1 = y1_t + apply(ml["12"], A["12"], mr["12"], x[:, 2])
        y2 = apply(ml["21"], A["21"], mr["21"], x[:, 1]) + apply(
            ml["22"], A["22"], mr["22"], x[:, 2]
        )
        if not ineq:
            return xp.stack([y0, y1, y2], axis=1)
        y1 = y1 + apply(ml["12"], A["12"], mr["12"], x[:, 3])
        y3 = apply(ml["31"], A["31"], mr["31"], x[:, 1]) + apply(
            ml["33"], A["33"], mr["33"], x[:, 3]
        )
        return xp.stack([y0, y1, y2, y3], axis=1)

    def project_rhs(bl, b, br, ineq):
        cols = [
            es("br,bmB,BR->rmR", bl[i], b[i], br[i])
            for i in range(nrows(ineq))
        ]
        return xp.stack(cols, axis=1)

    def den_clamp(den):
        """Sign-preserving floor for the projected-identity diagonal used
        in the dZ elimination (1/den): a dead basis direction makes den
        cross 0 at f32 noise level and 1/den overflows."""
        rel = 1e-6 if den.dtype == xp.float32 else 1e-14
        floor = rel * xp.max(xp.abs(den))
        sign = xp.where(den >= 0, 1.0, -1.0).astype(den.dtype)
        return sign * xp.maximum(xp.abs(den), floor)

    def tikhonov(S):
        """Dtype-aware Tikhonov term for the (near-singular) Schur
        systems.  f64: the reference's absolute 1e-11*I
        (src/tt_ipm.py:207).  f32: the term must sit above the data noise
        eps32*|S| or a basis-null direction yields a ~1e23 candidate the
        never-regress guard accepts (fused.py round-2 localisation)."""
        m = S.shape[0]
        if S.dtype == xp.float64:
            lam = 1e-11
        else:
            lam = 1e-6 * xp.max(xp.abs(S)) + 1e-11
        return S + lam * xp.eye(m, dtype=S.dtype)

    def column_scales(core):
        """Per-block-column equilibration norms, dtype-aware floor (the
        reference's absolute 1e-10 floor amplifies dead f32 columns —
        fused.py round-2 localisation)."""
        norms = xp.sqrt(xp.sum(core**2, axis=(0, 2, 3)))
        rel = 1e-5 if core.dtype == xp.float32 else 1e-12
        floor = xp.maximum(rel * xp.max(norms), 1e-10)
        return xp.maximum(norms, floor).reshape(1, -1, 1, 1)

    def unit_fro(core):
        """Unit-Frobenius z cores: the enrichment train is a direction
        basis only and the reference's scale recursion overflows f32."""
        nrm = xp.sqrt(xp.sum(core * core))
        return core / xp.maximum(nrm, TINY)

    def phi_bck_A(phi_next, cl, a, cr):
        return es("LSR,lML,sMNS,rNR->lsr", phi_next, cl, a, cr)

    def phi_fwd_A(phi_prev, cl, a, cr):
        return es("lsr,lML,sMNS,rNR->LSR", phi_prev, cl, a, cr)

    def phi_bck_rhs(phi_next, cb, c):
        return es("BR,bnB,rnR->br", phi_next, cb, c)

    def phi_fwd_rhs(phi_prev, cb, c):
        return es("br,bnB,rnR->BR", phi_prev, cb, c)

    def phis_bck(A, b, x_core, z_core, pr, br, zr, zbr, ineq):
        """All right-to-left interface updates after core k is re-split."""
        pl_new = {k: phi_bck_A(pr[k], x_core, A[k], x_core)
                  for k in keys(ineq)}
        bl_new = [phi_bck_rhs(br[i], b[i], x_core)
                  for i in range(nrows(ineq))]
        zl_new = None
        zbl_new = None
        if z_core is not None:
            zl_new = {k: phi_bck_A(zr[k], z_core, A[k], x_core)
                      for k in keys(ineq)}
            zl_new["10"] = phi_bck_A(
                zr["10"], z_core, xp.swapaxes(A["01"], 1, 2), x_core
            )
            zbl_new = [phi_bck_rhs(zbr[i], b[i], z_core)
                       for i in range(nrows(ineq))]
        return pl_new, bl_new, zl_new, zbl_new

    def phis_fwd(A, b, x_core, z_core, pl, bl, zl, zbl, ineq):
        pr_new = {k: phi_fwd_A(pl[k], x_core, A[k], x_core)
                  for k in keys(ineq)}
        br_new = [phi_fwd_rhs(bl[i], b[i], x_core)
                  for i in range(nrows(ineq))]
        zr_new = None
        zbr_new = None
        if z_core is not None:
            zr_new = {k: phi_fwd_A(zl[k], z_core, A[k], x_core)
                      for k in keys(ineq)}
            zr_new["10"] = phi_fwd_A(
                zl["10"], z_core, xp.swapaxes(A["01"], 1, 2), x_core
            )
            zbr_new = [phi_fwd_rhs(zbl[i], b[i], z_core)
                       for i in range(nrows(ineq))]
        return pr_new, br_new, zr_new, zbr_new

    def virtual_term_cores(A, x_cols, key, col, transpose):
        """Cores of the vec train A_key @ x_col, bond = (rA*rx)."""
        out = []
        for a_c, x_c in zip(A[key], x_cols[col]):
            eq = "snmS,xnX->sxmSX" if transpose else "smnS,xnX->sxmSX"
            v = es(eq, a_c, x_c)
            s, x, m, S, X = v.shape
            out.append(v.reshape(s * x, m, S * X))
        return out

    return SimpleNamespace(
        apply=apply, apply_T=apply_T, proj=proj,
        local_product=local_product, z_product=z_product,
        mixed_product=mixed_product, project_rhs=project_rhs,
        den_clamp=den_clamp, tikhonov=tikhonov,
        column_scales=column_scales, unit_fro=unit_fro,
        phi_bck_A=phi_bck_A, phi_fwd_A=phi_fwd_A,
        phi_bck_rhs=phi_bck_rhs, phi_fwd_rhs=phi_fwd_rhs,
        phis_bck=phis_bck, phis_fwd=phis_fwd,
        virtual_term_cores=virtual_term_cores,
    )


def make_sweep_steps(alg, es, xp, solve_local, split_svd, qr_reduced,
                     contig, zero_scalar):
    """Per-core sweep steps over the shared algebra ``alg``.

    ``solve_local``: the engine's local KKT solver (never-regress
    contract: returns (sol, rhs, res_old, res_min, dx));
    ``split_svd(mat)``: thin SVD returning (u, s, vt);
    ``qr_reduced(mat)``: reduced QR; ``contig``: layout normalizer
    (np.ascontiguousarray on host, identity on device);
    ``zero_scalar(ref)``: engine scalar zero (0.0 / traced 0)."""

    def trunc_svd(mat, k):
        u, s, vt = split_svd(mat)
        return u[:, :k], (s[:k, None] * vt[:k])

    def bck_split_step(pl, A, pr, bl, b, br, zl, zr, zbl, zbr, x_k, x_km1,
                       z_k, z_km1, ineq, r_out, kick, solve):
        """Backward-sweep step at core k>0: (solve), re-split the bond to
        rank ``r_out`` with ``kick`` projected-residual enrichment
        directions, merge the non-orthogonal factor left, update all bck
        interfaces (src/tt_als.py:277-394)."""
        rl, bs, n, rr = x_k.shape
        rz = z_k.shape[0]
        rz1 = z_k.shape[-1]
        r_out = min(r_out, n * rr, rl * bs)  # static clamp to SVD width
        if solve:
            sol, rhs, res_old, res_min, dx = solve_local(
                pl, A, pr, bl, b, br, x_k, ineq
            )
        else:
            sol = x_k
            res_old = res_min = dx = zero_scalar(x_k)

        scales = alg.column_scales(sol)
        mat = xp.reshape(scales * sol, (rl * bs, n * rr)).T
        u, s, vt = split_svd(mat)
        v = s[:, None] * vt

        # AMEn enrichment GROWS the basis by up to ``kick`` projected-
        # residual directions (src/tt_als.py:349-361); the bond rank
        # oscillates between r_out and r_out+kick, clamped structurally.
        width = min(r_out + kick, n * rr, rl * bs) if solve else r_out
        if solve and width > r_out:
            sol_trunc = xp.reshape(
                (u[:, :r_out] @ v[:r_out]).T, (rl, bs, n, rr)
            )
            Axz = alg.mixed_product(zl, pr, A, sol_trunc, ineq,
                                    transpose_right_phi=False)
            rhsxz = alg.project_rhs(zbl, b, br, ineq)
            resxz = xp.reshape(rhsxz - Axz, (rz * bs, n * rr)).T
            uz, _ = trunc_svd(resxz, width - r_out)
            u_aug = xp.concatenate([u[:, :r_out], uz], axis=1)
            q, Rf = qr_reduced(u_aug)
            u_core = contig(q.T).reshape(width, n, rr)
            v_new = (Rf[:, :r_out] @ v[:r_out]).T.reshape(rl, bs, width)
        else:
            u_core = contig(u[:, :width].T).reshape(width, n, rr)
            v_new = v[:width].T.reshape(rl, bs, width)

        x_km1_new = es("rdc,cbR->rbdR", x_km1, v_new) / scales

        # z-train update from the (z,z)-projected residual
        # (src/tt_als.py:160-181); on no-solve sweeps the raw z-core is
        # re-split instead (src/tt_als.py:180-181).
        if solve:
            Az = alg.z_product(zl, A, zr, sol, ineq)
            rhsz = alg.project_rhs(zbl, b, zbr, ineq)
            resz = xp.reshape(rhsz - Az, (rz * bs, n * rz1)).T
        else:
            resz = xp.reshape(z_k, (rz * bs, n * rz1)).T
        uzz, vzz = trunc_svd(resz, kick)
        z_core = contig(uzz.T).reshape(uzz.shape[1], n, rz1)
        vz_new = vzz.T.reshape(rz, bs, vzz.shape[0])
        z_km1_new = alg.unit_fro(
            es("rdc,cbR->rbdR", z_km1, vz_new) / scales
        )

        pl_new, bl_new, zl_new, zbl_new = alg.phis_bck(
            A, b, u_core, z_core, pr, br, zr, zbr, ineq
        )
        return (u_core, x_km1_new, z_core, z_km1_new, pl_new, bl_new,
                zl_new, zbl_new, res_old, res_min, dx)

    def bck_write_step(pl, A, pr, bl, b, br, zl, zr, zbl, zbr, x_k, z_k,
                       ineq, solve):
        """Backward-sweep step at core 0: (solve and) write, no split."""
        if solve:
            sol, rhs, res_old, res_min, dx = solve_local(
                pl, A, pr, bl, b, br, x_k, ineq
            )
            Az = alg.z_product(zl, A, zr, sol, ineq)
            rhsz = alg.project_rhs(zbl, b, zbr, ineq)
            z_new = alg.unit_fro((rhsz - Az) / alg.column_scales(sol))
        else:
            sol = x_k
            z_new = z_k
            res_old = res_min = dx = zero_scalar(x_k)
        return sol, z_new, res_old, res_min, dx

    def fwd_split_step(pl, A, pr, bl, b, br, zl, zr, zbl, zbr, x_k, x_kp1,
                       z_k, z_kp1, ineq, r_out, kick, solve):
        """Forward-sweep step at core k<d-1 (src/tt_als.py:397-522)."""
        rl, bs, n, rr = x_k.shape
        rz = z_k.shape[0]
        rz1 = z_k.shape[-1]
        r_out = min(r_out, rl * n, bs * rr)
        if solve:
            sol, rhs, res_old, res_min, dx = solve_local(
                pl, A, pr, bl, b, br, x_k, ineq
            )
        else:
            sol = x_k
            res_old = res_min = dx = zero_scalar(x_k)

        scales = alg.column_scales(sol)
        mat = xp.transpose(scales * sol, (0, 2, 1, 3)).reshape(
            rl * n, bs * rr
        )
        u, s, vt = split_svd(mat)
        v = s[:, None] * vt
        u3 = u.reshape(rl, n, -1)

        width = min(r_out + kick, rl * n, bs * rr) if solve else r_out
        if solve and width > r_out:
            sol_trunc = es(
                "rbR,RdK->rdbK", u3[:, :, :r_out],
                v[:r_out].reshape(r_out, bs, rr),
            )
            Axz = alg.mixed_product(pl, zr, A, sol_trunc, ineq,
                                    transpose_right_phi=True)
            rhsxz = alg.project_rhs(bl, b, zbr, ineq)
            resxz = xp.transpose(rhsxz - Axz, (0, 2, 1, 3)).reshape(
                rl * n, bs * rz1
            )
            uz, _ = trunc_svd(resxz, width - r_out)
            u_aug = xp.concatenate(
                [u3.reshape(rl * n, -1)[:, :r_out], uz], axis=1
            )
            q, Rf = qr_reduced(u_aug)
            u_core = q.reshape(rl, n, width)
            v_new = es(
                "rR,RdK->rdK", Rf[:, :r_out],
                v[:r_out].reshape(r_out, bs, rr),
            )
        else:
            u_core = u3[:, :, :width]
            v_new = v[:width].reshape(width, bs, rr)

        x_kp1_new = es("rbR,RdK->rbdK", v_new, x_kp1) / scales

        if solve:
            Az = alg.z_product(zl, A, zr, sol, ineq)
            rhsz = alg.project_rhs(zbl, b, zbr, ineq)
            resz = xp.transpose(rhsz - Az, (0, 2, 1, 3)).reshape(
                rz * n, bs * rz1
            )
        else:
            resz = xp.transpose(z_k, (0, 2, 1, 3)).reshape(rz * n, bs * rz1)
        uzz, vzz = trunc_svd(resz, kick)
        z_core = uzz.reshape(rz, n, uzz.shape[1])
        vz_new = vzz.reshape(vzz.shape[0], bs, rz1)
        z_kp1_new = alg.unit_fro(
            es("rbR,RdK->rbdK", vz_new, z_kp1) / scales
        )

        pr_new, br_new, zr_new, zbr_new = alg.phis_fwd(
            A, b, u_core, z_core, pl, bl, zl, zbl, ineq
        )
        return (u_core, x_kp1_new, z_core, z_kp1_new, pr_new, br_new,
                zr_new, zbr_new, res_old, res_min, dx)

    def fwd_write_step(pl, A, pr, bl, b, br, zl, zr, zbl, zbr, x_k, z_k,
                       ineq, solve):
        if solve:
            sol, rhs, res_old, res_min, dx = solve_local(
                pl, A, pr, bl, b, br, x_k, ineq
            )
            Az = alg.z_product(zl, A, zr, sol, ineq)
            rhsz = alg.project_rhs(zbl, b, zbr, ineq)
            z_new = alg.unit_fro((rhsz - Az) / alg.column_scales(sol))
        else:
            sol = x_k
            z_new = z_k
            res_old = res_min = dx = zero_scalar(x_k)
        return sol, z_new, res_old, res_min, dx

    return SimpleNamespace(
        trunc_svd=trunc_svd,
        bck_split_step=bck_split_step, bck_write_step=bck_write_step,
        fwd_split_step=fwd_split_step, fwd_write_step=fwd_write_step,
    )


# Residual-expansion term tables (rows of the canonical KKT block system).
ROW_TERMS_EQ = (
    (("00", 0, False), ("01", 1, False)),
    (("01", 0, True), ("12", 2, False)),
    (("21", 1, False), ("22", 2, False)),
)
ROW_TERMS_INEQ = (
    (("00", 0, False), ("01", 1, False)),
    (("01", 0, True), ("12", 2, False), ("12", 3, False)),
    (("21", 1, False), ("22", 2, False)),
    (("31", 1, False), ("33", 3, False)),
)
