#!/usr/bin/env python
"""Generate deterministic committed fixtures (tests/fixtures/).

- weather_raw.jsonl — OpenWeatherMap-shaped documents per FIXTURES.md §A1:
  the reference's 12 cities (/root/reference/dags/weather-etl.py:101-103),
  multiple fetch rounds, exact-duplicate docs (DISTINCT exercise),
  same-key-different-temp conflicts (last-write-wins exercise),
  0..3-element weather arrays, negative timezone offsets, extra API
  fields the read schema must ignore, and the "Breda,nl" query→name
  mismatch.
- nation.csv — CSV twin of the nation table (B3 scan fixture).

Deterministic: fixed base timestamp, no RNG. Re-running overwrites
byte-identically.
"""

from __future__ import annotations

import json
import os

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

# The reference's city list (query string, resolved name, tz offset sec).
CITIES = [
    ("Papendrecht", "Papendrecht", 3600),
    ("Dordrecht", "Dordrecht", 3600),
    ("Sliedrecht", "Sliedrecht", 3600),
    ("Alblasserdam", "Alblasserdam", 3600),
    ("Zwijndrecht", "Zwijndrecht", 3600),
    ("Hendrik-Ido-Ambacht", "Hendrik-Ido-Ambacht", 3600),
    ("Ridderkerk", "Ridderkerk", 3600),
    ("Rotterdam", "Rotterdam", 3600),
    ("Barendrecht", "Barendrecht", -18000),  # negative offset case
    ("Amsterdam", "Amsterdam", 7200),
    ("Breda,nl", "Breda", 0),  # query vs resolved-name mismatch
    ("Tilburg", "Tilburg", 3600),
]

CONDS = [
    {"id": 500, "main": "Rain", "description": "light rain", "icon": "10d"},
    {"id": 801, "main": "Clouds", "description": "few clouds", "icon": "02d"},
    {"id": 600, "main": "Snow", "description": "light snow", "icon": "13d"},
]

BASE_DT = 1_690_000_000  # 2023-07-22T05:06:40Z


def make_docs() -> list[dict]:
    docs = []
    for batch in range(4):
        dt = BASE_DT + batch * 300
        for i, (_query, name, tz) in enumerate(CITIES):
            n_conds = (i + batch) % 4  # 0..3-element weather arrays
            doc = {
                "dt": dt,
                "timezone": tz,
                "name": name,
                "weather": CONDS[:n_conds],
                "main": {
                    "temp": round(10.0 + i * 1.5 + batch * 0.25, 2),
                    "feels_like": round(9.0 + i * 1.5, 2),
                    "humidity": 60 + i,
                },
                # Extra fields the explicit read schema must ignore:
                "visibility": 10000,
                "wind": {"speed": 3.6, "deg": 220},
                "cod": 200,
            }
            docs.append(doc)
            if i == 0:
                docs.append(dict(doc))  # exact duplicate → DISTINCT (A10)
            if i == 1:
                conflict = dict(doc)
                conflict["main"] = dict(doc["main"], temp=doc["main"]["temp"] + 9.0)
                docs.append(conflict)  # same key, different temp → LWW (M1)
    return docs


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    with open(os.path.join(FIXDIR, "weather_raw.jsonl"), "w") as fh:
        for doc in make_docs():
            fh.write(json.dumps(doc, sort_keys=True) + "\n")

    import duckdb

    con = duckdb.connect()
    con.execute(
        "COPY (SELECT * FROM '/root/testdata/sf0.001/nation.parquet' "
        "ORDER BY n_nationkey) TO '"
        + os.path.join(FIXDIR, "nation.csv")
        + "' (FORMAT CSV, HEADER)"
    )
    print("fixtures written to", FIXDIR)


if __name__ == "__main__":
    main()
