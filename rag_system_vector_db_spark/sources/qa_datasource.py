"""Spark 4 Python DataSource for line-paired QA files — the
`spark.read.format("qa_files")` connector form of
``qa_files.load_qa_pairs`` (reference scripts/eval.py:30).

Where ``load_qa_pairs`` parses ONE driver-local pair (matching the
reference's config-sized artifact), this connector implements Spark's
custom-source contract properly: every questions/answers file pair is
its own ``InputPartition``, so a directory of many eval sets reads in
parallel on executors — the shape a corpus-scale eval suite (one pair
per benchmark) needs. Line pairing stays per-file-pair, so the
reference's index semantics hold inside each partition.

Usage:
    spark.dataSource.register(QAFileDataSource)
    df = (spark.read.format("qa_files")
          .option("pairs", "q1.txt:a1.txt,q2.txt:a2.txt").load())
    # -> (pair_id int, qa_id long, question string, expected_answer string)

A single pair can also be passed as .option("questions", ...) /
.option("answers", ...).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "pair_id int, qa_id bigint, question string, expected_answer string"


class QAFilePairPartition(InputPartition):
    def __init__(self, pair_id: int, questions_file: str, answers_file: str):
        self.pair_id = pair_id
        self.questions_file = questions_file
        self.answers_file = answers_file


class QAFileReader(DataSourceReader):
    def __init__(self, options: dict):
        pairs = options.get("pairs")
        if pairs:
            self._pairs = [
                tuple(p.split(":", 1)) for p in pairs.split(",") if p.strip()
            ]
        else:
            q, a = options.get("questions"), options.get("answers")
            if not q or not a:
                raise ValueError(
                    "qa_files needs .option('pairs', 'q:a,...') or "
                    ".option('questions', ...) + .option('answers', ...)"
                )
            self._pairs = [(q, a)]

    def partitions(self) -> list[InputPartition]:
        # one partition per file pair: pairs parse in parallel on
        # executors, each with the reference's per-pair line indexing
        return [
            QAFilePairPartition(i, q, a) for i, (q, a) in enumerate(self._pairs)
        ]

    def read(self, partition: QAFilePairPartition) -> Iterator[tuple]:
        # runs ON THE EXECUTOR — mirrors qa_files.load_qa_pairs exactly:
        # strip lines, pair by index, drop unmatched trailing lines
        with open(partition.questions_file) as qf:
            questions = [line.strip() for line in qf.readlines()]
        with open(partition.answers_file) as af:
            answers = [line.strip() for line in af.readlines()]
        for i in range(min(len(questions), len(answers))):
            yield (partition.pair_id, i, questions[i], answers[i])


class QAFileDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "qa_files"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> QAFileReader:
        return QAFileReader(dict(self.options))
