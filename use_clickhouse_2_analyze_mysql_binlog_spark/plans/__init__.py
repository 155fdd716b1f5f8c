"""Physical layout plans: partitioned storage, clustering, retention."""
