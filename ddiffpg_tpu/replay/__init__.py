"""HBM-resident replay: preallocated ring buffer (baselines) and the
slot-based episodic trajectory store with per-mode target-action tables
(DDiffPG)."""
