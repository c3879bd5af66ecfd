"""Entity-extraction actor stage (reference F3/ST4:
`/root/reference/src/webscraper/utils/text.py:206-341`).

The reference lazily downloads NLTK models per process and falls back to
regex patterns when NLTK is absent. Engine shape: a callable class →
``map_batches(EntityExtract, concurrency=N)`` actor pool — the model
load belongs in ``__init__`` (once per actor). NLTK is not installed in
this container, so the model branch is a STUB behind an import-try and
the regex branch (exact reference semantics, unit-tested in
tests/test_functions.py) is the active path.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import extract_entities


class EntityExtract:
    def __init__(self, use_nltk: bool = False):
        self.ner = None
        if use_nltk:
            try:  # pragma: no cover - nltk absent in this container
                import nltk  # noqa: F401

                self.ner = "nltk"  # model handles would be loaded here
            except ImportError as e:
                raise NotImplementedError(
                    "NLTK NER requested but nltk is not installed; "
                    "run with use_nltk=False for the regex branch"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(batch.column_names[0])
        texts = batch.column("text").to_pylist()
        # NULL text → NULL entity lists (SQL regexp_extract_all(NULL)
        # is NULL), not empty lists — downstream counts stay NULL
        ents = [None if t is None else extract_entities(t)
                for t in texts]

        def col(key):
            return pa.array([None if e is None else e.get(key, [])
                             for e in ents], pa.list_(pa.string()))

        return pa.table(
            {
                batch.column_names[0]: ids,
                "emails": col("emails"),
                "urls": col("urls"),
                "dates": col("dates"),
                "people": col("people"),
                "organizations": col("organizations"),
                "locations": col("locations"),
            }
        )
