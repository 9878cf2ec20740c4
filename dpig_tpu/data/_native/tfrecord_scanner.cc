// Native TFRecord scanner: indexes record offsets/lengths and validates
// CRC32C (Castagnoli, slicing-by-8) in one pass, so Python can mmap the
// file and slice records zero-copy.
//
// This is the framework's native data-plane replacement for the reference
// stack's C++ TFRecordReader kernels (the reference itself is pure Python
// on top of TF's readers; SURVEY §0). Built with: make -C this_dir
//
// API (extern "C"):
//   int64_t tfr_scan(const char* path, int64_t* offsets, int64_t* lengths,
//                    int64_t capacity, int verify_crc);
//     Returns the number of records (<= capacity filled), or -1 on I/O
//     error, -2 on a malformed/corrupt record. offsets point at record
//     payloads (not headers).
//   int64_t tfr_count(const char* path, int verify_crc);
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

uint32_t kCrcTable[8][256];
bool table_init_done = false;

void InitTables() {
  if (table_init_done) return;
  const uint32_t poly = 0x82F63B78u;  // Castagnoli, reversed
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int j = 0; j < 8; ++j) crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    kCrcTable[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = kCrcTable[0][i];
    for (int t = 1; t < 8; ++t) {
      crc = kCrcTable[0][crc & 0xFF] ^ (crc >> 8);
      kCrcTable[t][i] = crc;
    }
  }
  table_init_done = true;
}

uint32_t Crc32c(const uint8_t* data, size_t n) {
  InitTables();
  uint32_t crc = 0xFFFFFFFFu;
  // slicing-by-8
  while (n >= 8) {
    uint32_t lo;
    uint32_t hi;
    memcpy(&lo, data, 4);
    memcpy(&hi, data + 4, 4);
    lo ^= crc;
    crc = kCrcTable[7][lo & 0xFF] ^ kCrcTable[6][(lo >> 8) & 0xFF] ^
          kCrcTable[5][(lo >> 16) & 0xFF] ^ kCrcTable[4][lo >> 24] ^
          kCrcTable[3][hi & 0xFF] ^ kCrcTable[2][(hi >> 8) & 0xFF] ^
          kCrcTable[1][(hi >> 16) & 0xFF] ^ kCrcTable[0][hi >> 24];
    data += 8;
    n -= 8;
  }
  while (n--) crc = kCrcTable[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

uint32_t MaskedCrc(const uint8_t* data, size_t n) {
  uint32_t crc = Crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

}  // namespace

extern "C" {

int64_t tfr_scan(const char* path, int64_t* offsets, int64_t* lengths,
                 int64_t capacity, int verify_crc) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t count = 0;
  int64_t pos = 0;
  uint8_t header[12];
  std::vector<uint8_t> buf;
  while (true) {
    size_t got = fread(header, 1, 12, f);
    if (got == 0) break;          // clean EOF
    if (got != 12) { fclose(f); return -2; }
    uint64_t len;
    uint32_t len_crc;
    memcpy(&len, header, 8);
    memcpy(&len_crc, header + 8, 4);
    if (verify_crc && MaskedCrc(header, 8) != len_crc) {
      fclose(f);
      return -2;
    }
    if (count < capacity && offsets && lengths) {
      offsets[count] = pos + 12;
      lengths[count] = static_cast<int64_t>(len);
    }
    if (verify_crc) {
      buf.resize(len + 4);
      if (fread(buf.data(), 1, len + 4, f) != len + 4) {
        fclose(f);
        return -2;
      }
      uint32_t data_crc;
      memcpy(&data_crc, buf.data() + len, 4);
      if (MaskedCrc(buf.data(), len) != data_crc) {
        fclose(f);
        return -2;
      }
    } else {
      if (fseek(f, static_cast<long>(len + 4), SEEK_CUR) != 0) {
        fclose(f);
        return -2;
      }
    }
    pos += 12 + static_cast<int64_t>(len) + 4;
    ++count;
  }
  fclose(f);
  return count;
}

int64_t tfr_count(const char* path, int verify_crc) {
  return tfr_scan(path, nullptr, nullptr, 0, verify_crc);
}

}  // extern "C"
