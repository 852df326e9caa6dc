"""Mapper/linalg device-cost profiler (run on the real chip)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
rng = np.random.default_rng(0)
def timeit(name, fn, n=30):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n): r = fn()
    jax.block_until_ready(r)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
A = jnp.asarray(rng.normal(0,1,(4096,3,3)).astype(np.float32)); A = A @ A.transpose(0,2,1) + 3*jnp.eye(3)
B = jnp.asarray(rng.normal(0,1,(4096,4,4)).astype(np.float32)); B = B @ B.transpose(0,2,1) + 3*jnp.eye(4)
S = jnp.asarray(rng.normal(0,1,(60,60)).astype(np.float32)); S = S @ S.T + 10*jnp.eye(60)
b = jnp.asarray(rng.normal(0,1,(60,)).astype(np.float32))
timeit("inv (4096,3,3)", jax.jit(lambda: jnp.linalg.inv(A)))
timeit("svd (4096,4,4)", jax.jit(lambda: jnp.linalg.svd(B)[2]))
timeit("solve 60x60", jax.jit(lambda: jnp.linalg.solve(S, b)))
timeit("cho 60x60", jax.jit(lambda: jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), b)))
# closed-form 3x3 inverse via adjugate
def inv3(M):
    a,b_,c = M[...,0,0],M[...,0,1],M[...,0,2]
    d,e,f = M[...,1,0],M[...,1,1],M[...,1,2]
    g,h,i = M[...,2,0],M[...,2,1],M[...,2,2]
    A00 = e*i-f*h; A01 = c*h-b_*i; A02 = b_*f-c*e
    A10 = f*g-d*i; A11 = a*i-c*g; A12 = c*d-a*f
    A20 = d*h-e*g; A21 = b_*g-a*h; A22 = a*e-b_*d
    det = a*A00 + b_*A10 + c*A20
    adj = jnp.stack([jnp.stack([A00,A01,A02],-1),
                     jnp.stack([A10,A11,A12],-1),
                     jnp.stack([A20,A21,A22],-1)],-2)
    return adj / det[...,None,None]
timeit("inv3 closed form (4096,3,3)", jax.jit(lambda: inv3(A)))
err = jnp.max(jnp.abs(inv3(A) - jnp.linalg.inv(A)))
print("inv3 max err:", float(err))
