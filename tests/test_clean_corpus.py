"""Composite staged cleaning pipeline: per-stage semantics + resume."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _mk_corpus(tmp_path):
    texts = (
        ["good document with plenty of words inside " * 3] * 4  # dup x4
        + ["short"]  # too few words
        + ["!!! ??? ... ;;; ,,, clearly junk punctuation " + "!" * 50]  # punct
        + [
            " ".join(
                np.random.default_rng(i).choice(
                    ["alpha", "bravo", "cedar", "delta", "ember", "fjord", "gamma",
                     "hazel", "iris", "jolt", "karma", "lunar", "mango", "nadir"],
                    20,
                ).tolist()
            )
            for i in range(10)
        ]
        + ["near duplicate document with enough words to pass easily okay",
           "near duplicate document with enough words to pass easily okay!"]
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_clean_corpus_stages_and_resume(ray_session, tmp_path):
    from parquet_go_ray.pipelines.clean_corpus import clean_corpus

    sf = _mk_corpus(tmp_path)
    wd = str(tmp_path / "work")
    rep = clean_corpus(sf, wd, near_threshold=0.8, resume=False)
    assert rep["input_rows"] == 18
    assert rep["after_quality"] == 16  # short + junk filtered
    assert rep["after_exact"] == 13  # 4 exact dups -> 1
    assert rep["after_near"] == 12  # near-dup pair collapses
    # every stage must carry its own _SUCCESS marker, else resume recomputes it
    import os

    for stage in ("stage1_quality", "stage2_exact", "stage3_near"):
        assert os.path.exists(os.path.join(wd, stage, "_SUCCESS")), stage
    # resume: stage outputs exist -> second run recomputes nothing, same report
    rep2 = clean_corpus(sf, wd, near_threshold=0.8, resume=True)
    assert {k: rep2[k] for k in ("after_quality", "after_exact", "after_near")} == {
        k: rep[k] for k in ("after_quality", "after_exact", "after_near")
    }
