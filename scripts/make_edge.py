"""Synthesize the degenerate-input EDGE corpus at /tmp/sf_edge: the same
table schemas as sf0.001 (every non-documents table hard-linked), with
documents replaced by adversarial ASCII shapes — empty / whitespace-only /
punctuation-only / newline-only docs, single tokens, a 500x repeated token,
cross-doc boilerplate lines, an exact duplicate pair, tabs/CRs.  ASCII-only
by the tokenizer contract (the analyzer lowercases ASCII only; non-ASCII
case folding would diverge from DuckDB lower()).

Running the FULL oracle gate against it exercises every entry's
zero-token / zero-pair / zero-span paths:

    python scripts/make_edge.py && python scripts/verify_entries.py /tmp/sf_edge

First run (round 5) found and fixed 4 real bugs: empty-pair-Dataset crash
in _component_labels, columnless to_pandas() in dup_spans/curate_corpus,
NULL trainer weights in the ltr_rerank oracle, and the prf_from_ranking
zero-position-feedback-doc / numeric-learned-term contracts.

Usage: python scripts/make_edge.py [src_sf_dir] [out_dir]
"""

import os
import sys

import numpy as np
import pandas as pd

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_edge"
os.makedirs(out, exist_ok=True)
for f in os.listdir(src):
    if f != "documents.parquet" and not os.path.exists(f"{out}/{f}"):
        os.link(f"{src}/{f}", f"{out}/{f}")

texts = [
    "",                                        # empty
    "   ",                                     # whitespace only
    "a",                                       # single (stopword) token
    "7 7 7 7 7 7 7",                           # digits, heavy repeat
    ("x " * 500).strip(),                      # one token 500x (gram ties)
    "unique alpha line one\nSHARED NAVIGATION BAR LINE\nshort",
    "SHARED NAVIGATION BAR LINE\nanother unique beta line",
    "SHARED NAVIGATION BAR LINE",              # all-boilerplate doc
    "!!! ??? ... ---",                         # punctuation only: 0 tokens
    "Hello, WORLD! 123 hello world",           # case + digits
    "\n\n\n",                                  # newlines only
    "a\tb\rc d",                               # tabs / CR
    "Hello, WORLD! 123 hello world",           # exact dup of doc 9
    "the quick brown fox jumps over the lazy dog again and again",
    "dup key hash join window agg",            # hits the phrase blocklist
]
df = pd.DataFrame(
    {
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": (["en", "de", "fr", "es", "en"] * 3)[: len(texts)],
        "source": (["web", "book", "web", "code", "book"] * 3)[: len(texts)],
        "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
    }
)
df.to_parquet(f"{out}/documents.parquet", index=False)
print(f"wrote {len(df)} edge docs to {out}")
