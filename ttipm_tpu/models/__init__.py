"""SDP problem families generated directly in TT form.

Each module exposes ``create_problem(dim, rank)`` returning either
``(obj_tt, L_op_tt, bias_tt, lag_y)`` (equality-only) or
``(obj_tt, L_op_tt, bias_tt, ineq_mask, lag_maps)`` (with inequalities),
mirroring the reference's ``psd_system/`` package.
"""
