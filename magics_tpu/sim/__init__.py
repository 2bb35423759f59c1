"""Host-side simulation shell: scenario building, spawning, experiment runs."""
