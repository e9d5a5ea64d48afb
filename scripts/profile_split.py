"""Profile the hot-tile split pre-stage stages (round-6 item 2)."""
import sys, time, zlib
sys.path.insert(0, "/root/repo")
import numpy as np
from mapnik_vector_tile_spark.functions import commands as Cmd
from mapnik_vector_tile_spark.functions import pbf as P
from mapnik_vector_tile_spark.operators import decode as D

n = 300_000
rng = np.random.default_rng(7)
pxy = rng.integers(0, 4096, size=(n, 2)).astype(np.int64)
zz = np.column_stack([Cmd.zigzag32(pxy[:, 0]), Cmd.zigzag32(pxy[:, 1])])
tags = np.empty((n, 6), dtype=np.int64)
tags[:, 0] = 0
tags[:, 1] = np.arange(n) * 2
tags[:, 2] = 1
tags[:, 3] = np.arange(n) * 2 + 1
tags[:, 4] = 2
tags[:, 5] = 2 * n
blob = P.encode_point_features_packed(tags, zz, None)
values = []
for i in range(n):
    values.append(P.encode_value(f"im-{i:07d}"))
    values.append(P.encode_value(f"caption text number {i} of this tile"))
values.append(P.encode_value("png"))
layer = P.encode_layer_packed("layer", blob, ["image_id", "caption", "fmt"], values)
tile_raw = P.encode_tile([layer])
tile = zlib.compress(tile_raw)
print(f"tile: raw {len(tile_raw)/1e6:.1f} MB, compressed {len(tile)/1e6:.1f} MB")

def t(label, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best*1e3:8.1f} ms")
    return out

data = t("zlib.decompress", lambda: zlib.decompress(tile))
layers = t("pbf.decode_tile (layer iter)", lambda: P.decode_tile(data))
lb = bytes(P.decode_tile(data)[0])
sec = t("_layer_sections walk", lambda: D._layer_sections(lb))
misc, c, vstart, vend, runs = sec
print(f"  misc={len(misc)}B c={c} n_values={len(vstart)} n_runs={len(runs)}")
region = lb[runs[0][0]:runs[0][1]] if len(runs) == 1 else b"".join(lb[a:b] for a, b in runs)
vv = t("decode_varints_vec(region)", lambda: P.decode_varints_vec(region, return_lengths=True))
chunks = t("split_tile_chunks_smart TOTAL", lambda: D.split_tile_chunks_smart(data, 1 << 20))
print(f"  n_chunks={len(chunks)}")
t("full split incl. decompress", lambda: D.split_tile_chunks_smart(zlib.decompress(tile), 1 << 20))
