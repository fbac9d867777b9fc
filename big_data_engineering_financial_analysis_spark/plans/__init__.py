"""End-user query plans: serving/aggregation API + analytical join queries."""
