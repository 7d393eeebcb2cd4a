"""Edge-case oracles for functions/filters.py and functions/relational3.py:
crafted inputs written as tmp parquet tables, run through the real query
callables, compared against brute-force pandas/DuckDB references."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocrautomator_ray.functions.filters import (
    EMAIL_RE, PHONE_RE, _disc_threshold, pii_scrub, scrub_block,
)
from ocrautomator_ray.functions.relational3 import (
    ANCHOR_TYPE, FOLLOW_WINDOW_US, cumulative_user_value,
    followers_within_window,
)


def _events_parquet(tmp_path, df: pd.DataFrame) -> str:
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(t.schema.get_field_index("ts"),
                     "ts", t["ts"].cast(pa.timestamp("us")))
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _crafted_events() -> pd.DataFrame:
    """Two users; anchor ties, an anchor with zero followers, a follower
    exactly at the window edge (excluded: half-open interval)."""
    h = 3_600_000_000  # 1h in us
    base = pd.Timestamp("2024-03-01").value // 1000
    rows = [
        # user 1: anchor at t0; followers at +1h, +5h59m; edge at exactly +6h
        (1, 1, base + 0 * h, 1.25, ANCHOR_TYPE),
        (2, 1, base + 1 * h, 2.50, "view"),
        (3, 1, base + 5 * h + 3_540_000_000, 0.75, "purchase"),
        (4, 1, base + 6 * h, 99.0, "view"),          # at edge → excluded
        # user 1: tie — two events at the same timestamp, one an anchor
        (5, 1, base + 20 * h, 1.0, ANCHOR_TYPE),
        (6, 1, base + 20 * h, 3.0, "view"),
        # user 2: anchor with zero followers (must be dropped)
        (7, 2, base + 0 * h, 5.0, ANCHOR_TYPE),
        # user 2: anchor whose only follower is ANOTHER anchor
        (8, 2, base + 40 * h, 1.0, ANCHOR_TYPE),
        (9, 2, base + 41 * h, -2.0, ANCHOR_TYPE),    # negative value
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us",
                                     "value", "event_type"])
    df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us")
    return df


def _brute_followers(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for _, a in df[df["event_type"] == ANCHOR_TYPE].iterrows():
        t0 = a["ts"].value // 1000
        m = df[(df["user_id"] == a["user_id"])
               & (df["event_id"] != a["event_id"])
               & (df["ts"].astype(np.int64) // 1000 >= t0)
               & (df["ts"].astype(np.int64) // 1000 < t0 + FOLLOW_WINDOW_US)]
        if len(m):
            out.append((a["event_id"], len(m),
                        int(np.floor(m["value"].to_numpy() * 1e6 + 0.5)
                            .astype(np.int64).sum())))
    return pd.DataFrame(out, columns=["event_id", "n_follow",
                                      "sum_value_micros"])


@pytest.mark.usefixtures("ray_session")
def test_followers_within_window_crafted(tmp_path):
    df = _crafted_events()
    got = (followers_within_window(_events_parquet(tmp_path, df))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    want = _brute_followers(df).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the zero-follower anchor and the window-edge event behaved
    assert 7 not in got["event_id"].values
    assert got.set_index("event_id").loc[1, "n_follow"] == 2  # edge excluded


@pytest.mark.usefixtures("ray_session")
def test_cumulative_user_value_crafted(tmp_path):
    df = _crafted_events()
    got = (cumulative_user_value(_events_parquet(tmp_path, df))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    g = df.sort_values(["user_id", "ts", "event_id"]).copy()
    vint = np.floor(g["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    g["cum_value_micros"] = pd.Series(vint).groupby(
        g["user_id"].to_numpy()).cumsum().to_numpy()
    want = g[["event_id", "user_id", "cum_value_micros"]] \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pii_scrub_redacts():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "mail bob.smith+x@example.co.uk now",
            "call +1 (415) 555-0199 or 020 7946 0958 today",
            "both a@b.io and 12345678901",
            "nothing sensitive here",
        ]),
    })
    out = scrub_block(t)
    assert out["n_emails"].to_pylist() == [1, 0, 1, 0]
    assert out["n_phones"].to_pylist() == [0, 2, 1, 0]
    clean = out["clean_text"].to_pylist()
    assert clean[0] == "mail <EMAIL> now"
    assert "<PHONE>" in clean[1] and "555" not in clean[1]
    assert clean[2] == "both <EMAIL> and <PHONE>"
    assert clean[3] == "nothing sensitive here"
    # oracle parity on PII-bearing text (the sf corpus has no PII, so the
    # redaction path itself is pinned here against the same SQL expressions)
    con = duckdb.connect()
    con.register("docs", t)
    sql = f"""
        SELECT regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g') AS clean_text
        FROM docs ORDER BY doc_id"""
    assert [r[0] for r in con.execute(sql).fetchall()] == clean


def test_disc_threshold_matches_duckdb():
    rng = np.random.default_rng(7)
    vals = rng.integers(10, 40, size=137)
    uniq, counts = np.unique(vals, return_counts=True)
    for num, den in [(1, 2), (9, 10), (99, 100)]:
        got = _disc_threshold(uniq, counts, num, den)
        want = duckdb.sql(
            f"SELECT quantile_disc(v, {num / den}) FROM "
            "(SELECT unnest($vals) AS v)", params={"vals": vals.tolist()}
        ).fetchone()[0]
        assert got == want, (num, den)


@pytest.mark.usefixtures("ray_session")
def test_pii_scrub_identity_on_clean_corpus():
    out = pii_scrub("/root/testdata/sf0.001").to_pandas()
    assert (out["n_emails"] == 0).all() and (out["n_phones"] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_gopher_rules_crafted_docs(tmp_path):
    """Each Gopher rule exercised by a doc built to trip exactly it."""
    from ocrautomator_ray.functions.filters import gopher_rules

    good = ("the quick brown fox jumps over the lazy dog and runs on "
            "with it for a while in the sun as the day goes by ") * 3
    docs = {
        0: good,                                   # passes everything
        1: "word " * 10,                           # too few words
        2: "the of " + "# " * 40 + "word " * 60,   # symbol ratio >= 0.1
        3: "the of " + "\n".join("- b" for _ in range(20))
           + " " + "word " * 60,                   # >=90% bullet lines
        4: ("the of " + "word " * 60 + "\n"
            + "\n".join("tail..." for _ in range(9))),  # ellipsis ends
        5: "the of " + "1234 " * 60,               # <80% alphabetic words
        6: "zzz " * 60,                            # no stopwords
        7: "",                                     # empty text
        8: "the of " + "supercalifragilistic " * 60,  # mean word len > 10
    }
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()), pa.string()),
                  "lang": pa.array(["en"] * len(docs), pa.string()),
                  "source": pa.array(["s"] * len(docs), pa.string()),
                  "n_chars": pa.array([len(v) for v in docs.values()],
                                      pa.int64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = (gopher_rules(str(d)).to_pandas()
           .set_index("doc_id").sort_index())
    assert got.loc[0, "pass_gopher"] == 1
    assert got.loc[1, "ok_words"] == 0 and got.loc[1, "pass_gopher"] == 0
    assert got.loc[2, "ok_symbol"] == 0 and got.loc[2, "pass_gopher"] == 0
    assert got.loc[3, "ok_bullet"] == 0 and got.loc[3, "pass_gopher"] == 0
    assert got.loc[4, "ok_ellipsis"] == 0 and got.loc[4, "pass_gopher"] == 0
    assert got.loc[5, "ok_alpha"] == 0 and got.loc[5, "pass_gopher"] == 0
    assert got.loc[6, "ok_stop"] == 0 and got.loc[6, "pass_gopher"] == 0
    assert got.loc[7, "n_words"] == 0 and got.loc[7, "pass_gopher"] == 0
    assert got.loc[8, "ok_mwl"] == 0 and got.loc[8, "pass_gopher"] == 0
    # oracle parity on the crafted set (the sf corpora never trip some rules)
    from ocrautomator_ray.functions.filters import SQL_GOPHER_RULES
    con = duckdb.connect()
    con.register("documents", t)
    exp = (con.execute(SQL_GOPHER_RULES).df()
           .set_index("doc_id").sort_index())
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        exp[sorted(exp.columns)].astype(
            {c: got[c].dtype for c in got.columns if c in exp.columns}))


@pytest.mark.usefixtures("ray_session")
def test_winsorize_values_brute_force():
    """Clamp bounds vs a serial per-type recompute under the pinned
    quantile_disc rule; clamped values are exact copies (no arithmetic)."""
    from ocrautomator_ray.functions.filters import (
        WINSOR_HI, WINSOR_LO, winsorize_values,
    )
    from ocrautomator_ray.functions.relational2 import disc_quantile

    sf = "/root/testdata/sf0.001"
    got = winsorize_values(sf).to_pandas().sort_values("event_id")
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "event_type", "value"]
                       ).to_pandas().sort_values("event_id")
    assert len(got) == len(ev)
    for et, g in ev.groupby("event_type"):
        v = np.sort(g["value"].to_numpy())
        lo = disc_quantile(v, np.arange(1, len(v) + 1), *WINSOR_LO)
        hi = disc_quantile(v, np.arange(1, len(v) + 1), *WINSOR_HI)
        sub = got[got["event_type"] == et]
        expect = np.minimum(np.maximum(sub["value"].to_numpy(), lo), hi)
        assert (sub["value_w"].to_numpy() == expect).all()
        # clamped values are members of the original value set
        assert np.isin(sub["value_w"].to_numpy(), g["value"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_value_mad_matches_serial():
    """Single-process recompute of the per-type discrete median and MAD
    using the pinned quantile_disc rule (rank ceil(n/2))."""
    import numpy as np
    import pandas as pd

    from ocrautomator_ray.functions.filters import value_mad_by_type

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])

    def disc_med(vals):
        v = np.sort(vals)
        return v[-(-len(v) // 2) - 1]

    got = value_mad_by_type(sf).to_pandas().set_index("event_type")
    for et, g in ev.groupby("event_type"):
        med = disc_med(g["value"].to_numpy())
        mad = disc_med(np.abs(g["value"].to_numpy() - med))
        row = got.loc[et]
        assert row["n"] == len(g)
        assert row["med"] == med
        assert row["mad"] == mad
    # MAD is a scale: nonnegative and bounded by the max deviation
    assert (got["mad"] >= 0).all()
