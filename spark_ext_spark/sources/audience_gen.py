"""`audience_gen` — a custom Python DataSource (Spark 4 DataSource
API) generating the reference example's audience-modeling dataset
(DataGenerator.scala:10-63 semantics: positive cohort visits
'positive' sites with NY-area geo, negative cohort the mirror image;
impression counts ~ max(1, N(mean, mean))).

Where the reference generates on ONE machine and writes CSVs, this is
a first-class pluggable source: `spark.read.format("audience_gen")`
plans one InputPartition per cookie range and generates rows inside
executor tasks — at any requested scale, no driver materialization,
no intermediate files. Each cookie draws from its own
`random.Random(seed·1000003 + cookie_idx)`, so the dataset is a pure function
of (seed, cookies): invariant to the partition count and to task
retries — the determinism rule every synthetic source at 100 TB needs.

Options: table=sites|geo|response (default sites), cookies (default
1000), positiveFraction (default 0.1), numPartitions (default 8),
seed (default 42).

Register once per session, then it's a normal format:

>>> spark.dataSource.register(AudienceDataSource)
>>> spark.read.format("audience_gen").option("table", "geo").load()
"""

from __future__ import annotations

import math
import random

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

__all__ = ["AudienceDataSource", "register_audience_source"]

_SCHEMAS = {
    "sites": "cookie string, site string, impressions bigint",
    "geo": "cookie string, lat double, lon double, impressions bigint",
    "response": "cookie string, response double",
}

POSITIVE_SITES = [f"pos{i}.example.com" for i in range(15)]
NEGATIVE_SITES = [f"neg{i}.example.com" for i in range(17)]
# NY-ish vs LA-ish cohort centers (DataGenerator.scala:74-77,97-100)
POSITIVE_CENTER = (40.7127, -74.0059)
NEGATIVE_CENTER = (34.0500, -118.2500)


class _CookieRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _AudienceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.table = options.get("table", "sites")
        if self.table not in _SCHEMAS:
            raise ValueError(f"unknown table {self.table!r}; "
                             f"expected one of {sorted(_SCHEMAS)}")
        self.cookies = int(options.get("cookies", "1000"))
        self.pos_frac = float(options.get("positivefraction",
                                          options.get("positiveFraction",
                                                      "0.1")))
        self.n_parts = int(options.get("numpartitions",
                                       options.get("numPartitions", "8")))
        self.seed = int(options.get("seed", "42"))

    def partitions(self):
        chunk = max(1, math.ceil(self.cookies / self.n_parts))
        return [_CookieRange(lo, min(lo + chunk, self.cookies))
                for lo in range(0, self.cookies, chunk)]

    def read(self, partition: _CookieRange):
        n_pos = int(self.cookies * self.pos_frac)
        for ci in range(partition.start, partition.end):
            rng = random.Random(self.seed * 1_000_003 + ci)
            cookie = f"cookie{ci:06d}"
            positive = ci < n_pos

            def imp(mean):
                return max(1, int(mean + mean * rng.gauss(0, 1)))

            if self.table == "response":
                yield (cookie, 1.0 if positive else 0.0)
                continue
            prim_sites, sec_sites = ((POSITIVE_SITES, NEGATIVE_SITES)
                                     if positive else
                                     (NEGATIVE_SITES, POSITIVE_SITES))
            prim_geo, sec_geo = ((POSITIVE_CENTER, NEGATIVE_CENTER)
                                 if positive else
                                 (NEGATIVE_CENTER, POSITIVE_CENTER))
            if self.table == "sites":
                for s in rng.sample(prim_sites, 1 + rng.randrange(6)):
                    yield (cookie, s, imp(10))
                for s in rng.sample(sec_sites, 1 + rng.randrange(3)):
                    yield (cookie, s, imp(3))
            else:  # geo: N(center, 3°) like Predictors.latLon
                for _ in range(1 + rng.randrange(2)):
                    yield (cookie, prim_geo[0] + 3 * rng.gauss(0, 1),
                           prim_geo[1] + 3 * rng.gauss(0, 1), imp(10))
                for _ in range(1 + rng.randrange(1)):
                    yield (cookie, sec_geo[0] + 3 * rng.gauss(0, 1),
                           sec_geo[1] + 3 * rng.gauss(0, 1), imp(3))


class AudienceDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "audience_gen"

    def schema(self) -> str:
        # schema() runs before reader(): validate here too, or an
        # unknown table dies as a bare KeyError before the reader's
        # curated message is ever reached
        table = self.options.get("table", "sites")
        if table not in _SCHEMAS:
            raise ValueError(f"unknown table {table!r}; "
                             f"expected one of {sorted(_SCHEMAS)}")
        return _SCHEMAS[table]

    def reader(self, schema) -> DataSourceReader:
        return _AudienceReader(dict(self.options))


def register_audience_source(spark) -> None:
    spark.dataSource.register(AudienceDataSource)
