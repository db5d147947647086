"""Synthesize a 10x-replicated testdata dir for the scale smoke
(round-4 advice item #8): documents are replicated with remapped doc_ids
and a per-replica suffix token (so near-dup entries don't quadratically
explode); every other table is hard-linked unchanged.

Usage: python scripts/make_10x.py [src_sf_dir] [out_dir] [replicas]
"""

import os
import shutil
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10x"
repl = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
n = con.execute(
    f"SELECT COUNT(*), MAX(doc_id) FROM read_parquet('{src}/documents.parquet')"
).fetchone()
base = int(n[1]) + 1
con.execute(
    f"""
    COPY (
      SELECT r.r * {base} + d.doc_id AS doc_id,
             d.text || ' rep' || CAST(r.r AS VARCHAR)
                    || 'x' || CAST(d.doc_id % 13 AS VARCHAR) AS text,
             d.lang, d.source,
             length(d.text || ' rep' || CAST(r.r AS VARCHAR)
                    || 'x' || CAST(d.doc_id % 13 AS VARCHAR)) AS n_chars
      FROM read_parquet('{src}/documents.parquet') d
      CROSS JOIN (SELECT unnest(generate_series(0, {repl - 1})) AS r) r
      ORDER BY doc_id
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """
)
for t in (
    "region nation customer supplier part orders lineitem events "
    "embeddings".split()
):
    dst = f"{out}/{t}.parquet"
    # unconditional refresh: a skip-if-exists guard would leave stale
    # links to a REGENERATED source (mixed-generation corpus, no error)
    if os.path.exists(dst):
        os.remove(dst)
    try:
        os.link(f"{src}/{t}.parquet", dst)
    except OSError:
        shutil.copyfile(f"{src}/{t}.parquet", dst)
print(
    f"{out}: documents x{repl} =",
    con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()[0],
)
