"""Line-paired QA file source — reference scripts/eval.py:30
``parse_qa_files`` (questions.txt + answers.txt, line i of each file
forms a pair; unmatched trailing lines are dropped).

The files are driver-local, config-sized artifacts (the reference's
data/questions.txt is a handful of lines), so they are parsed driver-
side — exactly like the reference — and immediately parallelized into
a DataFrame for the distributed eval joins. A corpus-scale QA set
would live as parquet/JSONL with explicit ids instead; line pairing
across two distributed text files has no stable order to rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_qa_pairs(
    spark: SparkSession, questions_file: str, answers_file: str
) -> DataFrame:
    """Returns (qa_id, question, expected_answer); qa_id is the 0-based
    line number, mirroring the reference's list index."""
    with open(questions_file) as qf:
        questions = [line.strip() for line in qf.readlines()]
    with open(answers_file) as af:
        answers = [line.strip() for line in af.readlines()]
    n = min(len(questions), len(answers))
    rows = [(i, questions[i], answers[i]) for i in range(n)]
    return spark.createDataFrame(
        rows, "qa_id long, question string, expected_answer string"
    )
