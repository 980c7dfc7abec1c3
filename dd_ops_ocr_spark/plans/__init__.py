"""Physical-plan machinery: skew salting, checkpoint ledger."""
