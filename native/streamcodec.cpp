// streamcodec — framed append-only stream files for the data plane.
//
// The reference's data plane is JSONL files / Redis streams
// (/root/reference/pipelinerl/streams.py). Packed trainer batches are large
// (seq_length per-token columns); JSON-encoding them costs milliseconds per
// message and 4-6x the bytes. This codec frames opaque binary payloads
// (msgpack on the Python side) with CRC32 integrity:
//
//   frame := magic(4B "SCF1") | payload_len(8B LE) | crc32(4B LE) | payload
//
// Writers append atomically (single writev on an O_APPEND fd). Readers scan
// from a byte offset and return only complete, checksum-valid frames; a torn
// tail (a writer mid-append or a crash) stops the scan without consuming it,
// matching the JSONL reader's torn-line semantics (streams.py).
//
// C ABI only — consumed from Python via ctypes (no pybind11 in this image).

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/stat.h>
#include <sys/uio.h>
#include <unistd.h>

namespace {

constexpr uint8_t kMagic[4] = {'S', 'C', 'F', '1'};
constexpr size_t kHeaderSize = 4 + 8 + 4;

uint32_t crc_table[256];
bool crc_ready = false;

void init_crc() {
  if (crc_ready) return;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[i] = c;
  }
  crc_ready = true;
}

uint32_t crc32(const uint8_t* buf, uint64_t len) {
  init_crc();
  uint32_t c = 0xFFFFFFFFu;
  for (uint64_t i = 0; i < len; i++) c = crc_table[(c ^ buf[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

void put_le64(uint8_t* dst, uint64_t v) {
  for (int i = 0; i < 8; i++) dst[i] = (v >> (8 * i)) & 0xFF;
}

void put_le32(uint8_t* dst, uint32_t v) {
  for (int i = 0; i < 4; i++) dst[i] = (v >> (8 * i)) & 0xFF;
}

uint64_t get_le64(const uint8_t* src) {
  uint64_t v = 0;
  for (int i = 0; i < 8; i++) v |= (uint64_t)src[i] << (8 * i);
  return v;
}

uint32_t get_le32(const uint8_t* src) {
  uint32_t v = 0;
  for (int i = 0; i < 4; i++) v |= (uint32_t)src[i] << (8 * i);
  return v;
}

}  // namespace

extern "C" {

// Append one frame. Returns 0 on success, negative errno on failure.
int sc_write_frame(const char* path, const uint8_t* payload, uint64_t len) {
  int fd = open(path, O_WRONLY | O_CREAT | O_APPEND, 0644);
  if (fd < 0) return -errno;
  uint8_t header[kHeaderSize];
  memcpy(header, kMagic, 4);
  put_le64(header + 4, len);
  put_le32(header + 12, crc32(payload, len));
  struct iovec iov[2];
  iov[0].iov_base = header;
  iov[0].iov_len = kHeaderSize;
  iov[1].iov_base = const_cast<uint8_t*>(payload);
  iov[1].iov_len = len;
  ssize_t written = writev(fd, iov, 2);
  int rc = 0;
  if (written < 0 || (uint64_t)written != kHeaderSize + len) rc = written < 0 ? -errno : -EIO;
  if (close(fd) != 0 && rc == 0) rc = -errno;
  return rc;
}

// Scan complete frames starting at *offset.
//
// out layout per frame: payload_len(8B LE) | payload. Stops when out_cap
// would overflow, max_frames is reached, or a torn/invalid tail is found.
// *offset advances past consumed frames only. Returns the number of bytes
// written to out (>= 0), or negative errno.
int64_t sc_read_frames(const char* path, uint64_t* offset, uint8_t* out,
                       uint64_t out_cap, uint64_t max_frames,
                       uint64_t* frames_read) {
  *frames_read = 0;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return errno == ENOENT ? 0 : -errno;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    int e = -errno;
    close(fd);
    return e;
  }
  uint64_t file_size = (uint64_t)st.st_size;
  uint64_t pos = *offset;
  uint64_t out_used = 0;

  uint8_t header[kHeaderSize];
  while (*frames_read < max_frames && pos + kHeaderSize <= file_size) {
    ssize_t n = pread(fd, header, kHeaderSize, (off_t)pos);
    if (n != (ssize_t)kHeaderSize) break;
    if (memcmp(header, kMagic, 4) != 0) {
      close(fd);
      return -EBADMSG;  // corrupt stream — caller decides
    }
    uint64_t len = get_le64(header + 4);
    uint32_t crc = get_le32(header + 12);
    if (pos + kHeaderSize + len > file_size) break;  // torn tail: wait
    if (out_used + 8 + len > out_cap) break;         // caller buffer full
    put_le64(out + out_used, len);
    ssize_t pn = pread(fd, out + out_used + 8, len, (off_t)(pos + kHeaderSize));
    if (pn != (ssize_t)len) break;
    if (crc32(out + out_used + 8, len) != crc) {
      close(fd);
      return -EBADMSG;
    }
    out_used += 8 + len;
    pos += kHeaderSize + len;
    (*frames_read)++;
  }
  close(fd);
  *offset = pos;
  return (int64_t)out_used;
}

// Size in bytes a frame of `len` payload occupies on disk.
uint64_t sc_frame_overhead() { return kHeaderSize; }

}  // extern "C"
