"""Binary tx decode stage: the reference's `tx-deserialization` operator
(TopologyProducer.kt:86-96) as an Arrow-batched transformation.

Input: any DataFrame with a binary `value` column (Kafka's record value
shape). Output adds:

    tx_json: string  — canonical protobuf-JSON of the decoded Tx
                       (null when decode failed)
    error:   string  — decode failure message (null when decode
                       succeeded)

The original `value` bytes pass through untouched — the error branch
must emit them verbatim (TopologyProducer.kt:122), and rule topics may
re-serialize (here: original bytes, which round-trip identically for
the supported subset).

Downstream, `operators/dispatch.py` consumes this with
`json_col="tx_json", error_col="error"` — the full reference topology is
then decode → dispatch → route with zero extra stages.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions import protowire

_ADDED = "tx_json string, error string"


def decode_tx_records(df: DataFrame, value_col: str = "value") -> DataFrame:
    """mapInPandas decode with Result-style failure capture: one Python
    pass per record (wire parsing is inherently per-record), Arrow moves
    whole batches. At cluster scale swap in spark-protobuf's
    `from_protobuf` + descriptor set for a JVM-side decode; the column
    contract (nullable struct/json + error) is identical."""
    import json

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {_ADDED}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            txs: list[str | None] = []
            errs: list[str | None] = []
            for raw in pdf[value_col]:
                try:
                    obj = protowire.decode_tx(bytes(raw))
                    txs.append(json.dumps(obj, separators=(",", ":")))
                    errs.append(None)
                except protowire.DecodeError as e:
                    txs.append(None)
                    errs.append(str(e))
            pdf = pdf.copy()
            pdf["tx_json"] = txs
            pdf["error"] = errs
            yield pdf

    return df.mapInPandas(run, out_schema)
