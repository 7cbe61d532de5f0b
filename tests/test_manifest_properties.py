"""Property-based manifest-log tests (hypothesis, no Spark): random
interleavings of appends, rewrites (from possibly-stale base manifests),
and GC runs, checked against a sequential model.

The invariant under test is the one the protocol exists for: a rewrite
computed from a stale base NEVER drops a generation appended after that
base (the update function re-runs against the winner), and GC never
deletes a live or fresh generation.
"""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from wagtail_vector_index_spark.sources.manifest import ManifestLog

# op encodings: ("append",) | ("rewrite", base_age) | ("gc",)
OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append")),
        st.tuples(st.just("rewrite"), st.integers(min_value=0, max_value=3)),
        st.tuples(st.just("gc")),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(ops=OPS)
def test_random_interleavings_never_lose_appends(tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("mlog"))
    log = ManifestLog(root)
    history = []  # manifests in commit order (the "other writers" pool)
    model_live: set[str] = set()
    counter = 0

    def make_gen():
        nonlocal counter
        name = log.new_generation()
        os.makedirs(log.gen_path(name))
        # stamp a data file so has_data_files-style checks would pass
        open(os.path.join(log.gen_path(name), "part-0.parquet"), "w").write("x")
        counter += 1
        return name

    for op in ops:
        if op[0] == "append":
            gen = make_gen()
            m = log.commit(
                lambda cur, g=gen: ((list(cur.live) if cur else []) + [g], {})
            )
            history.append(m)
            model_live.add(gen)
        elif op[0] == "rewrite":
            # rewrite computed against a possibly-stale base: replaces
            # exactly the generations that base knew about
            base = history[-1 - op[1]] if len(history) > op[1] else None
            base_live = set(base.live) if base else set()
            gen = make_gen()

            def up(cur, g=gen, bl=base_live):
                cur_live = list(cur.live) if cur else []
                return [g] + [x for x in cur_live if x not in bl], {}

            m = log.commit(up)
            history.append(m)
            model_live = (model_live - base_live) | {gen}
        else:
            log.gc(keep_manifests=1, min_age_s=0.0)

    cur = log.current()
    if not history:
        assert cur is None  # gc on a never-committed table is a no-op
        return
    # 1. the committed live set matches the sequential model exactly
    assert set(cur.live) == model_live
    # 2. every live generation's data is still on disk (GC never ate one)
    for g in cur.live:
        assert os.path.isfile(os.path.join(log.gen_path(g), "part-0.parquet"))
    # 3. versions are strictly increasing and the newest manifest wins
    assert cur.version == len(history)
