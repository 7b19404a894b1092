"""Operator library (SURVEY §2). Every operator is a pure
``DataFrame -> DataFrame`` function — composable, streaming-compatible."""
