"""Synthetic yellow-taxi fixture with the pathology injections of
FIXTURES.md §1, plus an independent pandas oracle that re-implements the
reference semantics (data_processing.py:73-912) for the golden test.

The oracle is written from SURVEY.md §2's semantic description — it is the
behavioral specification, not a copy of the reference code.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

RNG_SEED = 4242

FLOAT_COLS = (
    "trip_distance",
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "total_amount",
    "congestion_surcharge",
    "airport_fee",
)

COMPONENTS = (
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "congestion_surcharge",
    "airport_fee",
)


def make_trips(n: int, year: int, month: int, rng: np.random.Generator) -> pd.DataFrame:
    base = pd.Timestamp(f"{year}-{month:02d}-01")
    pickup = base + pd.to_timedelta(rng.uniform(0, 27 * 24 * 3600, n), unit="s")
    pickup = pickup.round("s")
    duration_min = rng.uniform(1, 120, n)
    dropoff = pickup + pd.to_timedelta((duration_min * 60).round(), unit="s")

    fare = np.round(rng.lognormal(2.5, 0.7, n), 2)
    tip = np.round(fare * rng.uniform(0, 0.3, n), 2)
    extra = rng.choice([0.0, 0.5, 1.0, 2.5], n)
    mta = np.full(n, 0.5)
    tolls = np.where(rng.random(n) < 0.1, 6.55, 0.0)
    imp = np.full(n, 0.3)
    cong = rng.choice([0.0, 2.5], n)
    airport = np.where(rng.random(n) < 0.05, 1.75, 0.0)
    total = fare + tip + extra + mta + tolls + imp + cong + airport

    df = pd.DataFrame(
        {
            "VendorID": rng.choice([1, 2, 6, 7], n).astype("int64"),
            "tpep_pickup_datetime": pickup,
            "tpep_dropoff_datetime": dropoff,
            "passenger_count": rng.integers(1, 7, n).astype("int64"),
            "trip_distance": np.round(rng.lognormal(0.7, 0.8, n), 2),
            "RatecodeID": rng.choice([1, 1, 1, 2, 3, 4, 5, 6, 99], n).astype("int64"),
            "store_and_fwd_flag": rng.choice(["Y", "N", "N", "N"], n),
            "PULocationID": rng.integers(1, 266, n).astype("int64"),
            "DOLocationID": rng.integers(1, 266, n).astype("int64"),
            "payment_type": rng.choice([0, 1, 1, 1, 2, 2, 3, 4], n).astype("int64"),
            "fare_amount": fare,
            "extra": extra,
            "mta_tax": mta,
            "tip_amount": tip,
            "tolls_amount": tolls,
            "improvement_surcharge": imp,
            "total_amount": np.round(total, 2),
            "congestion_surcharge": cong,
            "airport_fee": airport,
        }
    )

    def mask(rate):
        return rng.random(n) < rate

    # FIXTURES.md §1 pathologies
    df.loc[mask(0.02), "VendorID"] = np.nan
    df.loc[mask(0.02), "passenger_count"] = np.nan
    df.loc[mask(0.02), "RatecodeID"] = np.nan
    df.loc[mask(0.02), "store_and_fwd_flag"] = None
    df.loc[mask(0.01), "PULocationID"] = np.nan
    df.loc[mask(0.01), "DOLocationID"] = np.nan
    df.loc[mask(0.02), "payment_type"] = np.nan
    df.loc[mask(0.02), "trip_distance"] = np.nan
    df.loc[mask(0.02), "fare_amount"] = np.nan
    df.loc[mask(0.02), "total_amount"] = np.nan
    df.loc[mask(0.02), "congestion_surcharge"] = np.nan
    df.loc[mask(0.02), "airport_fee"] = np.nan
    df.loc[mask(0.01), "tip_amount"] = np.nan

    df.loc[mask(0.02), "trip_distance"] = 0.0          # ≤0 → C4
    df.loc[mask(0.01), "trip_distance"] = 250.0        # >100 → C4
    df.loc[mask(0.01), "fare_amount"] = -7.5           # <0 → C5
    df.loc[mask(0.005), "fare_amount"] = 900.0         # >500 → C5
    df.loc[mask(0.02), "passenger_count"] = 0          # <1 → C6
    df.loc[mask(0.01), "passenger_count"] = 8          # >6 → C6
    df.loc[mask(0.03), "total_amount"] = df["total_amount"] + 5.0  # C7
    tt = mask(0.01)                                     # time travel → C8
    df.loc[tt, "tpep_dropoff_datetime"] = df.loc[tt, "tpep_pickup_datetime"] - pd.Timedelta(minutes=30)
    zd = mask(0.01)                                     # 0 duration → E2 trap
    df.loc[zd, "tpep_dropoff_datetime"] = df.loc[zd, "tpep_pickup_datetime"]
    df.loc[mask(0.01), "total_amount"] = 0.0            # E7 null-segment trap
    zf = mask(0.01)                                     # E8 division trap
    df.loc[zf, "fare_amount"] = 0.0
    df.loc[zf, "tip_amount"] = 2.0
    # wrong-month rows → P2 drop
    wm = mask(0.02)
    df.loc[wm, "tpep_pickup_datetime"] = df.loc[wm, "tpep_pickup_datetime"] + pd.DateOffset(months=2)
    # exact full-row duplicates → C9
    dupes = df.sample(frac=0.03, random_state=7)
    df = pd.concat([df, dupes], ignore_index=True)
    return df


def write_fixture_files(tmpdir: str, n: int = 4000) -> list[str]:
    """Two monthly files; the second drops airport_fee+congestion_surcharge
    (schema drift, mimicking pre-2021 files)."""
    rng = np.random.default_rng(RNG_SEED)
    paths = []
    # µs timestamps like the real TLC files — pandas' default ns precision
    # is a different (nanos) parquet logical type the engine treats as the
    # events-table drift case, not the taxi contract
    kw = dict(index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    a = make_trips(n, 2024, 1, rng)
    pa = f"{tmpdir}/yellow_tripdata_2024-01.parquet"
    a.to_parquet(pa, **kw)
    paths.append(pa)
    b = make_trips(n, 2024, 2, rng).drop(columns=["airport_fee", "congestion_surcharge"])
    pb = f"{tmpdir}/yellow_tripdata_2024-02.parquet"
    b.to_parquet(pb, **kw)
    paths.append(pb)
    return paths


# ---------------------------------------------------------------------------
# pandas oracle — reference semantics per SURVEY.md §2 (independent impl)
# ---------------------------------------------------------------------------

SCHEMA_DTYPES = {
    "VendorID": "Int8",
    "tpep_pickup_datetime": "datetime64[ns]",
    "tpep_dropoff_datetime": "datetime64[ns]",
    "passenger_count": "Int8",
    "trip_distance": "float32",
    "RatecodeID": "Int8",
    "store_and_fwd_flag": "object",
    "PULocationID": "Int16",
    "DOLocationID": "Int16",
    "payment_type": "Int8",
    **{c: "float32" for c in FLOAT_COLS},
}


def oracle_load(paths: list[str]) -> pd.DataFrame:
    """P2 filename filter + D2 drift union + P1 schema enforcement."""
    frames = []
    for p in paths:
        df = pd.read_parquet(p)
        name = p.rsplit("/", 1)[-1]
        y, m = int(name[16:20]), int(name[21:23])
        keep = (df["tpep_pickup_datetime"].dt.year == y) & (
            df["tpep_pickup_datetime"].dt.month == m
        )
        frames.append(df[keep])
    all_cols = []
    for f in frames:
        for c in f.columns:
            if c not in all_cols:
                all_cols.append(c)
    aligned = []
    for f in frames:
        f = f.copy()
        for c in all_cols:
            if c not in f.columns:
                f[c] = None
        aligned.append(f[all_cols])
    df = pd.concat(aligned, ignore_index=True)
    for c, dt in SCHEMA_DTYPES.items():
        if c in df.columns:
            try:
                df[c] = df[c].astype(dt)
            except (ValueError, TypeError):
                df[c] = pd.to_numeric(df[c], errors="coerce").astype(dt)
    return df


def oracle_clean(df: pd.DataFrame) -> pd.DataFrame:
    """C1-C10 in reference order (dp:73-210 semantics)."""
    df = df.copy()
    med_cols = [
        "passenger_count", "trip_distance", "fare_amount", "extra", "mta_tax",
        "tip_amount", "tolls_amount", "improvement_surcharge", "total_amount",
        "congestion_surcharge", "airport_fee",
    ]
    for c in med_cols:  # C1 — batch medians, pre-dedup
        if c in df.columns and df[c].isna().any():
            df[c] = df[c].fillna(df[c].median())
    for c in ("store_and_fwd_flag", "RatecodeID", "payment_type"):  # C2
        if c in df.columns and df[c].notna().any() and df[c].isna().any():
            modes = df[c].mode()
            df[c] = df[c].fillna(modes.iloc[0] if not modes.empty else "Unknown")
    for c in ("PULocationID", "DOLocationID"):  # C3
        if c in df.columns:
            df[c] = df[c].fillna(0)
    df = df.drop_duplicates()  # C9
    # C4 — p99 over all values incl. outliers, post-dedup
    bad = (df["trip_distance"] <= 0) | (df["trip_distance"] > 100)
    if bad.any():
        df.loc[bad, "trip_distance"] = df["trip_distance"].quantile(0.99)
    # C5 — p99 of non-negative fares
    bad = (df["fare_amount"] < 0) | (df["fare_amount"] > 500)
    if bad.any():
        df.loc[bad, "fare_amount"] = df.loc[df["fare_amount"] >= 0, "fare_amount"].quantile(0.99)
    # C6 — clamp
    df.loc[df["passenger_count"] < 1, "passenger_count"] = 1
    df.loc[df["passenger_count"] > 6, "passenger_count"] = 6
    # C7 — component-sum repair
    comp = sum(df[c] for c in COMPONENTS)
    off = (df["total_amount"] - comp).abs() > 0.1
    df.loc[off, "total_amount"] = comp
    # C8 — time travel repair
    tt = df["tpep_dropoff_datetime"] < df["tpep_pickup_datetime"]
    df.loc[tt, "tpep_dropoff_datetime"] = df.loc[tt, "tpep_pickup_datetime"] + pd.Timedelta(minutes=5)
    # C10 — invalid filter
    bad = (
        (df["fare_amount"] <= 0)
        | (df["trip_distance"] <= 0)
        | df["tpep_pickup_datetime"].isna()
        | df["tpep_dropoff_datetime"].isna()
    )
    return df[~bad]


def oracle_transform(df: pd.DataFrame) -> pd.DataFrame:
    """E1-E9 / P4 / P7 (dp:755-818 semantics)."""
    df = df.copy()
    dur = (df["tpep_dropoff_datetime"] - df["tpep_pickup_datetime"]).dt.total_seconds() / 60
    df["trip_duration_minutes"] = dur
    speed = df["trip_distance"].astype("float64") / (dur / 60)
    df["average_speed_mph"] = speed.clip(0, 100)
    df["pickup_hour"] = df["tpep_pickup_datetime"].dt.hour
    df["pickup_day_of_week"] = df["tpep_pickup_datetime"].dt.day_name()
    df["pickup_month"] = df["tpep_pickup_datetime"].dt.month
    df["pickup_year"] = df["tpep_pickup_datetime"].dt.year
    df["time_of_day"] = pd.cut(
        df["pickup_hour"], bins=[0, 6, 12, 18, 24],
        labels=["Night", "Morning", "Afternoon", "Evening"], include_lowest=True,
    )
    df["is_airport_trip"] = df["RatecodeID"].isin([2, 3])
    df["is_credit_card_payment"] = df["payment_type"] == 1
    df["is_weekend"] = df["tpep_pickup_datetime"].dt.dayofweek >= 5
    df["revenue_segment"] = pd.cut(
        df["total_amount"], bins=[0, 10, 20, 50, np.inf],
        labels=["Low", "Medium", "High", "Very High"],
    )
    tip_pct = df["tip_amount"].astype("float64") / df["fare_amount"].astype("float64") * 100
    df["tip_percentage"] = tip_pct.replace([np.inf, -np.inf], 0).fillna(0)
    df["is_valid_trip"] = (
        (dur > 0) & (dur < 180)
        & (df["trip_distance"] > 0) & (df["trip_distance"] < 100)
        & (df["fare_amount"] >= 0) & (df["total_amount"] >= 0)
    )
    return df


def oracle_metrics(df: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """A1-A5 over valid trips, counts = non-null counts, round(2)."""
    v = df[df["is_valid_trip"]]
    out = {}
    g = v.groupby("VendorID", observed=True)
    out["vendor_performance"] = pd.DataFrame(
        {
            "trip_count": g["trip_duration_minutes"].count(),
            "avg_duration": g["trip_duration_minutes"].mean().round(2),
            "median_duration": g["trip_duration_minutes"].median().round(2),
            "total_revenue": g["total_amount"].sum().round(2),
            "avg_revenue": g["total_amount"].mean().round(2),
            "median_revenue": g["total_amount"].median().round(2),
            "total_tips": g["tip_amount"].sum().round(2),
            "avg_tips": g["tip_amount"].mean().round(2),
            "avg_distance": g["trip_distance"].mean().round(2),
            "median_distance": g["trip_distance"].median().round(2),
        }
    ).reset_index()
    g = v.groupby("pickup_hour", observed=True)
    out["hourly_demand"] = pd.DataFrame(
        {
            "trip_count": g["VendorID"].count(),
            "total_revenue": g["total_amount"].sum().round(2),
            "avg_duration": g["trip_duration_minutes"].mean().round(2),
        }
    ).reset_index()
    g = v.groupby("PULocationID", observed=True)
    out["pickup_location_analysis"] = pd.DataFrame(
        {
            "trip_count": g["VendorID"].count(),
            "total_revenue": g["total_amount"].sum().round(2),
            "avg_duration": g["trip_duration_minutes"].mean().round(2),
        }
    ).reset_index()
    g = v.groupby("payment_type", observed=True)
    out["payment_analysis"] = pd.DataFrame(
        {
            "trip_count": g["VendorID"].count(),
            "total_revenue": g["total_amount"].sum().round(2),
            "total_tips": g["tip_amount"].sum().round(2),
            "avg_tip_percentage": g["tip_percentage"].mean().round(2),
        }
    ).reset_index()
    g = v.groupby(["pickup_year", "pickup_month"], observed=True)
    out["monthly_summary"] = pd.DataFrame(
        {
            "trip_count": g["VendorID"].count(),
            "total_revenue": g["total_amount"].sum().round(2),
            "avg_duration": g["trip_duration_minutes"].mean().round(2),
            "avg_distance": g["trip_distance"].mean().round(2),
        }
    ).reset_index()
    return out
