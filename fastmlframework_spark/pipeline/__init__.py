"""Orchestration layer (SURVEY.md §2.11): Luigi-style task DAG with
file-target memoization, plus the reference's solution task chain."""
