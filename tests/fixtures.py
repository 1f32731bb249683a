"""Seeded fixture generators (FIXTURES.md F1/F2)."""

from __future__ import annotations

import numpy as np
import pandas as pd

#: FIXTURES.md F2 — same 5-node shape as /root/reference/DFF_Ruleset.dmn:3-34.
RULESET_JSON = {
    "version": "v1",
    "sensitivity": 0.7,
    "rules": [
        {"id": "R1", "name": "AUTHZN_AMT > ACCT_AVL_CASH_BEFORE_AMT", "requires": []},
        {"id": "R2", "name": "AUTHZN_AMT > ACCT_CL_AMT and CDHLDR_PRES_CD = 0", "requires": ["R1"]},
        {"id": "R3", "name": "AUTHZN_AMT > AVG_DLY_AUTHZN_AMT", "requires": ["R2"]},
        {"id": "R4", "name": "LAST_ADR_CHNG_DUR < 300", "requires": ["R3"]},
        {"id": "R5", "name": "score:txn_score", "requires": ["R3"]},
    ],
}

CYCLIC_RULESET_JSON = {
    "version": "v1",
    "sensitivity": 0.7,
    "rules": [
        {"id": "A", "name": "AUTHZN_AMT > 1", "requires": ["B"]},
        {"id": "B", "name": "AUTHZN_AMT > 2", "requires": ["A"]},
    ],
}


def txns_fixture(n: int = 512, seed: int = 42) -> pd.DataFrame:
    """F1 transaction table: ranges from /root/repo/FIXTURES.md, with forced
    coverage of every rule branch (rows triggering each of R1-R4, CDHLDR=0
    vs !=0, LAST_ADR_CHNG_DUR straddling 300, and rows triggering nothing)."""
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "AUTH_ID": np.arange(n, dtype=np.int64),
            "ACCT_ID_TOKEN": rng.integers(10**9, 10**10, n),
            "ACCT_AVL_CASH_BEFORE_AMT": rng.uniform(0, 30000, n).round(2),
            "ACCT_CL_AMT": rng.uniform(0, 40000, n).round(2),
            "AUTHZN_AMT": rng.uniform(0, 4400, n).round(2),
            "AVG_DLY_AUTHZN_AMT": rng.uniform(0, 603, n).round(2),
            "CDHLDR_PRES_CD": rng.integers(0, 6, n).astype(np.float64),
            "LAST_ADR_CHNG_DUR": rng.integers(0, 1000, n).astype(np.float64),
            "DISTANCE_FROM_HOME": rng.uniform(0, 7000, n).round(2),
            "FRD_IND": rng.integers(0, 2, n).astype(np.int32),
        }
    )
    # force branch coverage
    pdf.loc[0, ["AUTHZN_AMT", "ACCT_AVL_CASH_BEFORE_AMT"]] = [100.0, 10.0]   # R1 fires
    pdf.loc[1, ["AUTHZN_AMT", "ACCT_CL_AMT", "CDHLDR_PRES_CD",
                "ACCT_AVL_CASH_BEFORE_AMT"]] = [4000.0, 100.0, 0.0, 9000.0]  # R2 fires
    pdf.loc[2, ["AUTHZN_AMT", "AVG_DLY_AUTHZN_AMT", "ACCT_AVL_CASH_BEFORE_AMT",
                "ACCT_CL_AMT", "CDHLDR_PRES_CD"]] = [500.0, 10.0, 9000.0, 9000.0, 1.0]  # R3
    pdf.loc[3, ["AUTHZN_AMT", "AVG_DLY_AUTHZN_AMT", "ACCT_AVL_CASH_BEFORE_AMT",
                "LAST_ADR_CHNG_DUR"]] = [1.0, 500.0, 9000.0, 100.0]          # R4 fires
    pdf.loc[4, ["AUTHZN_AMT", "AVG_DLY_AUTHZN_AMT", "ACCT_AVL_CASH_BEFORE_AMT",
                "LAST_ADR_CHNG_DUR"]] = [1.0, 500.0, 9000.0, 800.0]          # nothing
    pdf.loc[5, "LAST_ADR_CHNG_DUR"] = 300.0                                  # boundary
    pdf.loc[6, "LAST_ADR_CHNG_DUR"] = 299.0
    return pdf
