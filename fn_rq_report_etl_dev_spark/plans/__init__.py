"""Plan-inspection helpers for asserting physical properties (pushdown,
broadcast, exchange reuse) in tests and during tuning."""
