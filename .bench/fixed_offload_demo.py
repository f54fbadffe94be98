"""Out-of-core fixed-label training on ONE chip: the per-bond engine + offload
store runs a batch whose wing table cannot fit device HBM (the reference's
Nbatch/proj_images semantics, SURVEY.md fixedL.cc:115-157 analog).

B=20,000 fixed-label wings: ~391 labelled sites x [B,10,120]bf16 (48 MB each)
-> ~19 GB table vs 16 GB HBM.  Wings live in host RAM (OffloadEnvStore) and
promote/demote per bond with bounded device residency.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
from tnml_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tnml_tpu.data.mnist import TRAIN, read_mnist
from tnml_tpu.models.fixedl import FixedLConfig, FixedLModel, cold_start
from tnml_tpu.ops.feature import FEATURE_SERIES, featurize
from tnml_tpu.train.envstore import OffloadEnvStore

B = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 24   # bonds to time

ds = read_mnist("/root/reference/mllib/MNIST", TRAIN, nt=max(1, B // 10),
                verbose=False)
X = featurize(ds.images, FEATURE_SERIES, d=2)
print(f"[offload-demo] {X.shape[0]} images, fixed label, pad=120", flush=True)

cfg = FixedLConfig(nsweep=1, maxm=120, cutoff=1e-10, lam=1e-3, npass=4,
                   ninitial=10, pad=120, label_mode="fixed",
                   method="fast_conj_exact", precision="highest")
w = cold_start(X, ds.labels, ninitial=10, verbose=False)
store = OffloadEnvStore(keep=4)
eng = FixedLModel(w).make_engine(X, ds.labels, cfg, pad=120, env_store=store)
eng.env_dtype = jnp.bfloat16

t0 = time.time()
eng.init_envs()
print(f"[offload-demo] env init (incremental, demoting): {time.time()-t0:.1f}s",
      flush=True)
res = getattr(store, "n_device", lambda: "n/a")() if hasattr(store, "n_device") else len(store)
print(f"[offload-demo] store residency: {res}", flush=True)

t0 = time.time()
for k, (b, direction) in enumerate(
        [(i, +1) for i in range(NB)]):
    eng.bond_step(1, b, direction, maxm=120, minm=10, cutoff=1e-10)
dt = time.time() - t0
per = dt / NB
print(f"[offload-demo] {NB} bond steps: {per*1e3:.0f} ms/bond -> "
      f"~{per*2*(eng.n-1)/60:.1f} min/sweep extrapolated", flush=True)
