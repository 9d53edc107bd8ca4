import numpy as np
import pandas as pd

from etl_rust_spark.changelog import (
    ChangelogConfig,
    generate_changelog_pandas,
    generate_changelog_spark,
    replay_oracle_pandas,
)


def test_generator_is_seed_stable():
    cfg = ChangelogConfig(n_events=500, seed=7)
    a = generate_changelog_pandas(cfg)
    b = generate_changelog_pandas(cfg)
    pd.testing.assert_frame_equal(a, b)
    c = generate_changelog_pandas(ChangelogConfig(n_events=500, seed=8))
    assert not a.equals(c)


def test_generator_knobs():
    cfg = ChangelogConfig(
        n_events=2000, dup_fraction=0.1, delete_fraction=0.1, evolve_after=1000
    )
    df = generate_changelog_pandas(cfg)
    assert len(df) == 2200  # 10% duplicate delivery
    assert df.lsn.nunique() == 2000
    assert set(df.op.unique()) <= {"I", "U", "D"}
    assert df[df.op == "D"].text.isna().all()
    # schema evolution: meta appears only from lsn >= evolve_after
    assert df[df.lsn < 1000].meta.isna().all()
    assert df[(df.lsn >= 1000) & (df.op != "D")].meta.notna().all()


def test_hot_share_skew_fixture():
    cfg = ChangelogConfig(n_events=20000, hot_share=0.5, n_conversations=50)
    df = generate_changelog_pandas(cfg)
    top = df.conv_id.value_counts(normalize=True).iloc[0]
    assert 0.45 < top < 0.55


def test_oracle_semantics():
    log = pd.DataFrame(
        {
            "lsn": [0, 1, 2, 3, 4],
            "op": ["I", "U", "I", "D", "U"],
            "conv_id": ["a", "a", "b", "b", "a"],
            "turn_idx": np.int32([0, 0, 0, 0, 1]),
            "role": ["user", "user", "user", None, "assistant"],
            "text": ["v0", "v1", "x", None, "y"],
            "tool": ["", "", "", None, "bash"],
            "ts": pd.to_datetime([1, 2, 3, None, 5], unit="s"),
        }
    )
    # late delivery: shuffle emission order — oracle must be order-independent
    final = replay_oracle_pandas(log.sample(frac=1.0, random_state=0))
    assert list(final.conv_id) == ["a", "a"]  # b@0 deleted by lsn 3
    assert list(final.text) == ["v1", "y"]  # a@0 updated by lsn 1


def test_spark_generator_deterministic_and_consistent(spark):
    a = generate_changelog_spark(spark, 5000, n_conversations=200, parallelism=4)
    b = generate_changelog_spark(spark, 5000, n_conversations=200, parallelism=13)
    pa = a.toPandas().sort_values("lsn").reset_index(drop=True)
    pb = b.toPandas().sort_values("lsn").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa, pb)  # partitioning-independent
    assert pa.lsn.is_unique
    assert set(pa.op.unique()) <= {"I", "U", "D"}
    # heavy head: most popular conversation well above uniform share
    top = pa.conv_id.value_counts(normalize=True).iloc[0]
    assert top > 5.0 / 200
