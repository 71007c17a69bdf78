import sys, time
from pathlib import Path
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import warnings; warnings.simplefilter("ignore")

# Reuse bench setup by importing its main pieces manually
exec(Path("/root/repo/bench.py").read_text().split("def main()")[0])
from darsia_tpu.corrections.shape.curvature import CurvatureCorrection
from darsia_tpu.ops.color import rgb_to_gray
from darsia_tpu.ops.fft import phase_correlation
from darsia_tpu.ops.pallas.warp2pass import warp_two_pass
from darsia_tpu.ops.solvers import jacobi_solve
from darsia_tpu.ops.warp import identity_grid
from darsia_tpu.utils.interpolation import _tps_kernel

base_u8 = _load_image()
H, W = base_u8.shape[:2]
print("image", H, W)
curv = CurvatureCorrection(config={
    "crop": {"pts_src": [[8, 11], [H-33, 16], [H-40, W-15], [5, W-15]], "width": 2.8, "height": 1.5},
    "bulge": {"horizontal_bulge": -1e-9, "vertical_bulge": -2.7e-8, "vertical_center_offset": -31},
})
curv._precompute_transformed_coordinates((H, W))
grid = jnp.asarray(curv.cache["grid"], jnp.float32)
OH, OW = (int(s) for s in curv.cache["shape"])
id_in = identity_grid((OH, OW))
curv_disp = int(np.ceil(float(jnp.max(jnp.abs(grid - id_in))))) + 1
balance = jnp.eye(3, dtype=jnp.float32)

img = jnp.asarray(base_u8)

def timeit(name, fn, *args, reps=10):
    f = jax.jit(fn)
    def fetch(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return float(jnp.asarray(leaf).ravel()[0])
    out = f(*args)
    _ = fetch(out)  # warm
    tic = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = fetch(out)  # forces completion
    dt = (time.perf_counter() - tic) / reps
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt

total = 0
total += timeit("u8->f32 + matmul balance", lambda x: jnp.matmul(x.astype(jnp.float32)/255., balance, precision="highest"), img)
balanced = jnp.matmul(img.astype(jnp.float32)/255., balance)
total += timeit("pallas curvature warp", lambda b: warp_two_pass(b, grid, curv_disp), balanced)
corrected = warp_two_pass(balanced, grid, curv_disp)
gray = rgb_to_gray(corrected)
total += timeit("rgb_to_gray", rgb_to_gray, corrected)

NP_I, NP_J = 8, 16
win = (256, 256)
pv = (int(np.ceil(OH/NP_I)), int(np.ceil(OW/NP_J)))
centers = np.array([[min(int((i+.5)*pv[0]), OH-1), min(int((j+.5)*pv[1]), OW-1)]
                    for i in range(NP_I) for j in range(NP_J)], np.int32)
centers_dev = jnp.asarray(centers)
limits = jnp.array([OH-win[0], OW-win[1]], jnp.int32)
def extract_windows(g):
    def get(c):
        start = jnp.clip(c - jnp.array(win, jnp.int32)//2, 0, limits)
        return lax.dynamic_slice(g, (start[0], start[1]), win)
    return jax.vmap(get)(centers_dev)
total += timeit("extract 128 windows", extract_windows, gray)
wins = extract_windows(gray)
total += timeit("128x phase correlation", lambda a, b: jax.vmap(phase_correlation)(a, b), wins, wins)

# TPS coarse eval
bc = []
for y in np.linspace(0, OH, NP_I+1): bc += [[0., y], [float(OW), y]]
for x in np.linspace(0, OW, NP_J+1): bc += [[x, float(OH)]]
bc = np.unique(np.array(bc, np.float32), axis=0)
pts = np.concatenate([np.stack([centers[:,1], centers[:,0]],1).astype(np.float32), bc])
n_pts = pts.shape[0]
d = np.linalg.norm(pts[:,None]-pts[None], axis=-1)
K = np.where(d>0, d*d*np.log(np.where(d>0, d, 1.)), 0.)
poly = np.concatenate([np.ones((n_pts,1)), pts], 1)
A = np.block([[K, poly],[poly.T, np.zeros((3,3))]])
Ainv = jnp.asarray(np.linalg.inv(A), jnp.float32)
pts_dev = jnp.asarray(pts); p_sq = jnp.sum(pts_dev*pts_dev, -1)[None]
CH, CW = (OH+15)//16, (OW+15)//16
rows, cols = np.meshgrid(np.linspace(0,OH-1,CH,dtype=np.float32), np.linspace(0,OW-1,CW,dtype=np.float32), indexing="ij")
query = jnp.asarray(np.stack([cols.ravel(), rows.ravel()],1), jnp.float32)
def tps_eval(vx, vy):
    wx = Ainv @ jnp.concatenate([vx, jnp.zeros(3, jnp.float32)])
    wy = Ainv @ jnp.concatenate([vy, jnp.zeros(3, jnp.float32)])
    q_sq = jnp.sum(query*query, -1, keepdims=True)
    cross = jnp.matmul(query, pts_dev.T, precision="highest")
    r = jnp.sqrt(jnp.maximum(q_sq - 2*cross + p_sq, 0.))
    Kq = _tps_kernel(r)
    dx = (Kq @ wx[:n_pts] + wx[n_pts] + query @ wx[n_pts+1:]).reshape(CH, CW)
    dy = (Kq @ wy[:n_pts] + wy[n_pts] + query @ wy[n_pts+1:]).reshape(CH, CW)
    return jax.image.resize(jnp.stack([dy, dx]), (2, OH, OW), method="linear")
vx = jnp.zeros(n_pts, jnp.float32); vy = jnp.zeros(n_pts, jnp.float32)
total += timeit("TPS solve+eval+upsample", tps_eval, vx, vy)
id_grid = identity_grid((OH, OW))
total += timeit("pallas registration warp", lambda c: warp_two_pass(c, id_grid, 128), corrected)
diff = corrected
total += timeit("diff+gray", lambda a, b: rgb_to_gray(jnp.clip(a-b, 0., None)), corrected, corrected)
sig = gray
total += timeit("10 jacobi sweeps", lambda s: jacobi_solve(s, s, 1.0, 0.2, dim=2, maxiter=10), sig)
print(f"{'SUM of stages':28s} {total*1e3:8.2f} ms -> {H*W/1e6/total:.1f} Mpix/s (stage-sum)")
