"""Framework-free repro of the axon-TPU f64-emulation scan-fusion drift.

Pure jax.numpy: an unrolled masked BiCGStab-like iteration (8 iterations, 5-
point stencil applies, masked early exit) driven by a transcendental-heavy
moving-Gaussian forcing on a 129x129 f64 grid — run once as ``jit(step)``
and once as ``jit(scan(step, length=1))``, i.e. the IDENTICAL computation in
two program shapes.

Measured (TPU v5 lite via the axon plugin, 2026-08):

    max|scan1 - standalone|   CPU x64        axon TPU (f64 emulation)
    without the forcing       0.0            3.6e-15   (normal roundoff)
    WITH the forcing          1.7e-18        7.7e-11   (fusion-dependent loss)

The production framework observes the same phenomenon at larger magnitude on
its real step (2.0e-9/step — studies/scan_fusion_noise_probe.py): wrapping a
step in lax.scan changes XLA's fusion of the transcendental-heavy parts and
some fused shapes evaluate them at reduced emulated precision.  This is a
lowering/emulation property, not an algorithm or loop-primitive property
(studies/axon_while_probe.py: all loop-carry shapes are clean in isolation).

Usage: [CPU=1] python studies/scan_fusion_synthetic_repro.py"""
import os, sys
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if os.environ.get("CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

N = 129
rng = np.random.RandomState(3)
mask = np.zeros((N, N)); mask[1:-1, 1:-1] = 1.0
mask = jnp.asarray(mask)
planes = [jnp.asarray(0.1*rng.rand(N, N))*mask for _ in range(4)]
c0 = (2.0 + jnp.asarray(0.4*rng.rand(N, N)))*mask
b0 = jnp.asarray(rng.rand(N, N))*mask

def apply5(u):
    um = jnp.pad(u[:-1, :], ((1,0),(0,0)))
    up = jnp.pad(u[1:, :], ((0,1),(0,0)))
    vm = jnp.pad(u[:, :-1], ((0,0),(1,0)))
    vp = jnp.pad(u[:, 1:], ((0,0),(0,1)))
    return c0*u + planes[0]*um + planes[1]*up + planes[2]*vm + planes[3]*vp

def solve(bb):
    # 8 unrolled masked BiCGStab iterations, mirroring the production solver
    dot = lambda u, v: jnp.sum(u*v)
    r = bb; rhat = r
    tol_sq = 1e-26*dot(bb, bb)
    x = jnp.zeros_like(bb); z = x
    p = v = z
    rho = alpha = omega = jnp.asarray(1.0)
    done = dot(r, r) <= tol_sq
    for _ in range(8):
        keep = lambda o, n: jnp.where(done, o, n)
        rho1 = dot(rhat, r)
        beta = (rho1/rho)*(alpha/omega)
        p_n = r + beta*(p - omega*v)
        v_n = apply5(p_n)
        alpha_n = rho1/dot(rhat, v_n)
        s = r - alpha_n*v_n
        x_h = x + alpha_n*p_n
        t = apply5(s)
        omega_n = dot(t, s)/dot(t, t)
        x = keep(x, x_h + omega_n*s)
        r = keep(r, s - omega_n*t)
        p, v = keep(p, p_n), keep(v, v_n)
        rho, alpha, omega = keep(rho, rho1), keep(alpha, alpha_n), keep(omega, omega_n)
        done = done | (dot(r, r) <= tol_sq)
    return x

X, Y = jnp.meshgrid(jnp.linspace(0,1,N), jnp.linspace(0,1,N), indexing="ij")

def forcing(t):
    # transcendental-heavy manufactured forcing, like the peaks case
    g1 = jnp.exp(-80.0*((X-0.3-0.02*t)**2 + (Y-0.4)**2))
    g2 = jnp.exp(-60.0*((X-0.7)**2 + (Y-0.6+0.03*t)**2))
    return (10.0*g1 + 8.0*g2)*jnp.sin(3.0*t + X*Y) + jnp.cos(5.0*t)*g1*g2

def step(u):
    t = jnp.sum(u*mask)*1e-6  # data-dependent "time" so forcing can't fold
    d1 = solve((u + forcing(t))*mask)
    d2 = solve((u + 0.5*d1*jnp.exp(-0.01*d1) + forcing(t+1e-3))*mask)
    d3 = solve((u + 0.25*d2*jnp.tanh(d2))*mask)
    return (u + 1e-3*(d1 + d2 + d3))*mask

f_alone = jax.jit(step)
f_scan = jax.jit(lambda u: jax.lax.scan(lambda c, _: (step(c), None), u, None, length=1)[0])
a = f_alone(b0); s = f_scan(b0)
jax.block_until_ready((a, s))
backend = "cpu" if os.environ.get("CPU") == "1" else "tpu"
print(f"{backend}: max|scan1 - step| = {float(jnp.max(jnp.abs(a - s))):.3e}")
