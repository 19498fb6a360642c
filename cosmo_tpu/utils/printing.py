"""Console output (reference: src/printing.jl)."""
from __future__ import annotations


def print_header(model, m: int, n: int):
    s = model.settings
    sets = model.sets
    from collections import Counter

    counts = Counter(type(c).__name__ for c in sets)
    set_str = ", ".join(f"{k} x{v}" for k, v in counts.items())
    print("-" * 66)
    print("          cosmo_tpu - A TPU-native conic ADMM solver")
    print("-" * 66)
    print(f"problem:  variables n = {n}, constraints m = {m}")
    print(f"sets:     {set_str}")
    print(
        f"settings: eps_abs = {s.eps_abs:.1e}, eps_rel = {s.eps_rel:.1e},\n"
        f"          eps_prim_inf = {s.eps_prim_inf:.1e}, eps_dual_inf = {s.eps_dual_inf:.1e},\n"
        f"          rho = {s.rho}, sigma = {s.sigma}, alpha = {s.alpha},\n"
        f"          max_iter = {s.max_iter}, scaling iter = {s.scaling},\n"
        f"          check termination every {s.check_termination} iter,\n"
        f"          check infeasibility every {s.check_infeasibility} iter,\n"
        f"          KKT solver = {s.kkt_solver}, accelerator = {s.accelerator}"
    )


def print_result(model, result):
    print("-" * 66)
    print(f">>> status: {result.status}")
    print(f">>> optimal objective: {result.obj_val:.6g}")
    print(
        f">>> residuals: r_prim = {result.info.r_prim:.2e}, "
        f"r_dual = {result.info.r_dual:.2e}"
    )
    print(
        f">>> iterations: {result.iter} "
        f"(incl. {result.safeguarding_iter} safeguarding)"
    )
    print(f">>> solve time: {result.times.solver_time:.4f}s")
    print("-" * 66)
