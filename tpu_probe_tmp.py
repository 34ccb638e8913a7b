import jax, jax.numpy as jnp, numpy as np, time
from functools import partial

def timeit(f, *args, reps=3):
    out = f(*args); s = float(jnp.sum(out))  # compile+force
    ts=[]
    for i in range(reps):
        t=time.time(); out=f(*args); s=float(jnp.sum(out)); ts.append(time.time()-t)
    return np.median(ts)

key = jax.random.PRNGKey(0)
N = 1<<22  # 4.2M samples
vol = jax.random.uniform(key, (256,256,256))
flat = vol.reshape(-1)
idx = jax.random.randint(key, (N,), 0, flat.shape[0])
pos = jax.random.uniform(key, (N,3))

@jax.jit
def flat_take(flat, idx, salt):
    return jnp.take(flat, idx, axis=0) + salt

@jax.jit
def take8(vol, pos, salt):
    dims = jnp.asarray(vol.shape, jnp.float32)
    p = pos*dims-0.5; i0=jnp.floor(p); frac=p-i0; i0=i0.astype(jnp.int32)
    def ax(a,o): return jnp.clip(i0[...,a]+o,0,vol.shape[a]-1)
    sy=vol.shape[1]*vol.shape[2]; sz=vol.shape[2]; f=vol.reshape(-1)
    def corner(dx,dy,dz): return jnp.take(f, ax(0,dx)*sy+ax(1,dy)*sz+ax(2,dz),axis=0)
    fx,fy,fz=frac[...,0],frac[...,1],frac[...,2]
    c00=corner(0,0,0)*(1-fz)+corner(0,0,1)*fz
    c01=corner(0,1,0)*(1-fz)+corner(0,1,1)*fz
    c10=corner(1,0,0)*(1-fz)+corner(1,0,1)*fz
    c11=corner(1,1,0)*(1-fz)+corner(1,1,1)*fz
    return (c00*(1-fy)+c01*fy)*(1-fx)+(c10*(1-fy)+c11*fy)*fx + salt

tf = jax.random.uniform(key,(256,4))
tfidx = jax.random.randint(key,(N,),0,256)
@jax.jit
def tf_take(tf, tfidx, salt):
    return jnp.take(tf, tfidx, axis=0)[...,0] + salt

@jax.jit
def tf_onehot(tf, tfpos, salt):
    # one-hot matmul lookup: (N,256)@(256,4)
    x = tfpos*255.0
    i = jnp.floor(x); f = (x-i)[:,None]
    grid = jnp.arange(256,dtype=jnp.float32)[None,:]
    oh0 = (grid == i[:,None]).astype(jnp.float32)
    c0 = oh0 @ tf
    oh1 = (grid == jnp.clip(i+1,0,255)[:,None]).astype(jnp.float32)
    c1 = oh1 @ tf
    return (c0+(c1-c0)*f)[...,0] + salt

tfpos = jax.random.uniform(key,(N,))
for name, f, args in [
    ("flat_take 4M from 16M", flat_take, (flat, idx)),
    ("trilinear8 4M", take8, (vol, pos)),
    ("tf_take 4M from 256", tf_take, (tf, tfidx)),
    ("tf_onehot 4M", tf_onehot, (tf, tfpos)),
]:
    try:
        dt = timeit(f, *args, jnp.float32(1.0))
        print(f"{name}: {dt*1e3:.1f} ms -> {N/dt/1e6:.0f}M lookups/s", flush=True)
    except Exception as e:
        print(name, "FAIL", str(e)[:100], flush=True)
