"""TensorBoard event compatibility: files written by our SummaryWriter
must read back through TensorFlow's own event reader with the reference's
tags (scalars: cyclegan/model.py:166-173; images: :193-195,270-275)."""

import numpy as np
import pytest

from cyclegan_tpu.utils.metrics import Mean, make_metric_dict
from cyclegan_tpu.utils.summary import SummaryWriter


def test_mean_accumulator():
    m = Mean("x")
    assert m.result() == 0.0
    m.update_state(2.0)
    m.update_state(4.0)
    assert m.result() == pytest.approx(3.0)
    m.reset_states()
    assert m.result() == 0.0
    metrics = make_metric_dict(["a", "b"])
    assert set(metrics) == {"a", "b"}


def test_events_readable_by_tensorflow(tmp_path):
    pytest.importorskip("tensorboardX")
    tf = pytest.importorskip("tensorflow")
    from tensorflow.python.summary.summary_iterator import summary_iterator

    writer = SummaryWriter(str(tmp_path))
    writer.scalar("dA_loss", 0.25, step=3)
    writer.scalar("gAB_loss", 2.5, step=3)
    rng = np.random.default_rng(0)
    writer.images("A2B_predictions", rng.random((2, 8, 8, 3)), step=3,
                  max_outputs=2)
    writer.close()

    scalars = {}
    image_tags = set()
    for event_file in tmp_path.glob("events*"):
        for event in summary_iterator(str(event_file)):
            for value in event.summary.value:
                if value.HasField("simple_value"):
                    scalars[value.tag] = (event.step, value.simple_value)
                elif value.HasField("image") or "A2B" in value.tag:
                    image_tags.add(value.tag)
    assert scalars["dA_loss"] == (3, pytest.approx(0.25))
    assert scalars["gAB_loss"] == (3, pytest.approx(2.5))
    assert any("A2B_predictions" in tag for tag in image_tags)
