# Dev targets (capability parity with the reference Makefile:1-25).

.PHONY: test
test:
	python -m pytest tests/ -q

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
