// Native unit test: SPSC ring semantics incl. overwrite-oldest under overrun.
#include <cassert>
#include <cstdio>
#include <thread>
#include <vector>

#include "ring_buffer.hpp"

int main() {
  {
    rmt::RingBuffer rb(16);
    assert(rb.capacity() == 16);
    uint8_t in[10] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9};
    rb.write_overwrite(in, 10);
    uint8_t out[10] = {};
    assert(rb.read(out, 10) == 10);
    for (int i = 0; i < 10; i++) assert(out[i] == i);
    assert(rb.read(out, 1) == 0);  // empty
  }
  {
    // Overrun drops the whole INCOMING chunk (SPSC-safe drop-newest;
    // drop-oldest would need the producer to move the consumer's tail,
    // racing concurrent reads — see ring_buffer.hpp).
    rmt::RingBuffer rb(8);
    uint8_t a[6] = {1, 1, 1, 1, 1, 1};
    uint8_t b[6] = {2, 2, 2, 2, 2, 2};
    rb.write_overwrite(a, 6);
    rb.write_overwrite(b, 6);  // 6 free < 6 wanted (cap 8, 6 used): drop b
    assert(rb.total_dropped() == 6);
    uint8_t out[8];
    size_t got = rb.read(out, 8);
    assert(got == 6);
    for (size_t i = 0; i < got; i++) assert(out[i] == 1);
    // ...and the next chunk lands intact once space frees up.
    rb.write_overwrite(b, 6);
    got = rb.read(out, 8);
    assert(got == 6 && out[0] == 2 && out[5] == 2);
  }
  {
    // Concurrent producer/consumer preserves the byte stream.
    rmt::RingBuffer rb(1 << 16);
    const size_t total = 1 << 22;
    std::thread producer([&] {
      uint8_t buf[257];
      size_t sent = 0;
      while (sent < total) {
        size_t n = std::min(sizeof buf, total - sent);
        for (size_t i = 0; i < n; i++) buf[i] = static_cast<uint8_t>((sent + i) & 0xff);
        while (rb.writable() < n) std::this_thread::yield();  // no-drop mode
        rb.write_overwrite(buf, n);
        sent += n;
      }
    });
    size_t received = 0;
    uint8_t out[509];
    while (received < total) {
      size_t got = rb.read(out, sizeof out);
      for (size_t i = 0; i < got; i++) {
        assert(out[i] == static_cast<uint8_t>((received + i) & 0xff));
      }
      received += got;
      if (!got) std::this_thread::yield();
    }
    producer.join();
    assert(rb.total_dropped() == 0);
  }
  std::printf("ring buffer tests passed\n");
  return 0;
}
