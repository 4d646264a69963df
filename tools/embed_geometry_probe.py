#!/usr/bin/env python3
"""Embedding-geometry probe: measures whether ANY sub-quadratic exact
cosine-threshold join is possible on the given embeddings table at the
given tau (driver-side analysis tool; python/duckdb/numpy are available
driver-side only).

Reports, for /root/testdata/<sf>/embeddings.parquet:
  - norm distribution (unit sphere?)
  - pairwise-cosine quantiles and the fraction >= tau
  - PCA variance spectrum (is there low-dimensional structure a
    projection-based prefilter could exploit?)
  - label-centroid cohesion (is there cluster structure a
    triangle-inequality cluster-pair prefilter could exploit?)
  - the LSH exponent rho = ln(1/p1)/ln(1/p2) at tau (sign-LSH), and the
    candidate rate a recall~1 band setting admits for a random pair

Round-13 finding on the driver's sf0.01/sf0.1 data (tau = 0.35):
  embeddings are ~uniform on the 64-dim unit sphere (top PC 2.8% of
  variance, mean cos-to-label-centroid 0.14, pair cosines ~N(0, 1/64)).
  d_tau = sqrt(2-2*0.35) = 1.14 while cluster radii are ~1.3 and centroid
  separations < 0.5 -> the triangle-inequality bound ||mu1-mu2|| >
  d_tau + r1 + r2 prunes NOTHING; sign-LSH at tau = 0.35 has
  p1 = 1 - arccos(.35)/pi = 0.614 vs p2 = 0.5, rho = 0.70, and any
  band setting with near-1 recall at the tau boundary admits >= 85% of
  random pairs. A recall-1 sub-quadratic exact threshold join at this
  (tau, dim, data) therefore does not exist by any known method: the
  declared-exact keys (dedup_embed_cosine, sim_join_threshold) stay
  quarantined behind cardinality guards as bounded-exactness oracle
  fixtures; the production paths are dedup_semdedup_cluster (cluster-
  scoped dedup) and sim_join_lsh_threshold (banded near-dup join at a
  near-dup tau, where LSH has provable per-pair recall bounds).
"""
import sys
import duckdb
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
tau = float(sys.argv[2]) if len(sys.argv) > 2 else 0.35

con = duckdb.connect()
rows = con.execute(
    f"SELECT vec_id, label, embedding FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id"
).fetchall()
V = np.array([np.array(r[2], dtype=np.float64) for r in rows])
labels = np.array([r[1] for r in rows])
n, dim = V.shape
norms = np.linalg.norm(V, axis=1)
Vn = V / np.maximum(norms[:, None], 1e-12)

print(f"n={n} dim={dim} labels={len(set(labels))}")
print(f"norms: min={norms.min():.3f} med={np.median(norms):.3f} max={norms.max():.3f}")

# pair-cosine distribution (sample if large)
idx = np.random.RandomState(7).choice(n, size=min(n, 2000), replace=False)
C = Vn[idx] @ Vn[idx].T
iu = np.triu_indices(len(idx), 1)
cs = C[iu]
print("cos quantiles [1,50,99,99.9]%:", np.percentile(cs, [1, 50, 99, 99.9]).round(3))
print(f"fraction >= tau({tau}): {(cs >= tau).mean():.5f}")

# PCA spectrum
w = np.linalg.svd(Vn - Vn.mean(0), compute_uv=False) ** 2
w = w / w.sum()
print("PCA var top 1/4/16:", [round(w[:k].sum(), 3) for k in (1, 4, 16)])

# cluster cohesion: kmeans-lite (label centroids as proxy)
rad = []
for lab in set(labels):
    m = Vn[labels == lab].mean(0)
    rad.append(np.linalg.norm(Vn[labels == lab] - m, axis=1).max())
d_tau = np.sqrt(2 - 2 * tau)
print(f"d_tau={d_tau:.3f}  max-cluster-radius~{max(rad):.3f} "
      f"(prune needs centroid separation > d_tau + r1 + r2 = {d_tau + 2 * max(rad):.2f}; "
      f"sphere diameter is 2.0)")

# sign-LSH feasibility at tau
p1 = 1 - np.arccos(tau) / np.pi
rho = np.log(1 / p1) / np.log(2.0)
print(f"sign-LSH: p1(tau)={p1:.3f} p2(random)=0.5 rho={rho:.3f}")
for r, b in [(2, 32), (8, 64), (12, 16), (16, 24)]:
    miss_tau = (1 - p1 ** r) ** b
    cand_rand = 1 - (1 - 0.5 ** r) ** b
    print(f"  r={r:3d} b={b:3d}: recall@tau={1-miss_tau:.4f} random-pair cand rate={cand_rand:.4f}")
