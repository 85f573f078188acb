"""Generate one shard of the big scaling corpus (no Spark needed).

Builds the deterministic synthetic world at a given seed, remaps urls
with a shard prefix (urls are the only cross-shard collision surface;
html content never embeds them), and writes parquet with pyarrow.
Shards with distinct seeds are disjoint corpora; concatenating K
shards gives a K*~200k-page input whose linking problem grows
linearly (titles from different seeds never collide).

Usage: python scripts/gen_shard.py SEED N_WORKS FILLER OUT_DIR
e.g.   python scripts/gen_shard.py 105 150000 150 \
           /tmp/spark_graft_pages_big/shard=105
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

seed = int(sys.argv[1])
n_works = int(sys.argv[2])
filler = int(sys.argv[3])
out = sys.argv[4]

from openalex_neo4j_spark.corpus import build_world  # noqa: E402

world = build_world(n_works, seed=seed, filler_words=filler)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

os.makedirs(out, exist_ok=True)
urls, tss, htmls, texts, langs = [], [], [], [], []
for p in world.pages:
    urls.append(f"https://s{seed}.shard.invalid/{p.url.split('://', 1)[1]}")
    tss.append(p.warc_ts)
    htmls.append(p.html)
    texts.append(p.text)
    langs.append(p.lang)

n = len(urls)
nfiles = 8
step = (n + nfiles - 1) // nfiles
for i in range(nfiles):
    sl = slice(i * step, (i + 1) * step)
    tbl = pa.table({
        "url": pa.array(urls[sl], pa.string()),
        "warc_ts": pa.array(tss[sl], pa.timestamp("us")),
        "html": pa.array(htmls[sl], pa.binary()),
        "text": pa.array(texts[sl], pa.string()),
        "lang": pa.array(langs[sl], pa.string()),
    })
    pq.write_table(tbl, f"{out}/part-{i:05d}.parquet")
open(f"{out}/_SUCCESS", "w").close()
print("shard", seed, "pages", n)
