# Dev targets (capability parity with the reference Makefile:1-25).

.PHONY: test
test:
	python -m pytest tests/ -q

# Fast unit tier: excludes the TF-parity / subprocess / soak tests
# (marked "parity"); CI runs both tiers.
.PHONY: test-fast
test-fast:
	python -m pytest tests/ -q -m "not parity"

.PHONY: tensorboard
tensorboard:
	tensorboard --logdir=model_instances

.PHONY: native
native:
	$(MAKE) -C native

.PHONY: bench
bench:
	python bench.py

# Data acquisition (the reference's prefect flows as plain CLIs).
.PHONY: download
download:
	python -m cyclegan_tpu.apps.flows download --breeds "Tabby" "Tortoiseshell" \
		--destination data/raw --pages 10

.PHONY: tfrecords
tfrecords:
	python -m cyclegan_tpu.apps.flows tfrecords \
		--images data/raw/Tabby data/raw/Tortoiseshell \
		--destination data/tabby_records data/tortie_records --size 256

# dvc-pull equivalent: materialize manifest-pinned shards from DATA_REMOTE
# (URL or directory), sha256-verified (reference: Makefile:17-20, dvc pull).
.PHONY: fetch
fetch:
	python -m cyclegan_tpu.apps.flows fetch \
		--records_dir data/tabby_records data/tortie_records \
		--remote $(DATA_REMOTE)
