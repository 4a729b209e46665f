"""Pipeline assembly — the reference's end-to-end job as composable
Spark plans (SURVEY.md §7.2 step 5)."""
