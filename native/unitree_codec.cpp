// Unitree legged_sdk v3.2 wire protocol codec (LowCmd / LowState / HighCmd
// / HighState) — the byte layouts the reference speaks to real A1/Go1
// hardware over UDP (reference: HardwareInterface.cpp:7, 86-120 LOWLEVEL
// 8090 -> 192.168.123.10:8007; UnitreeComm.hpp:28 HIGHLEVEL 8090 ->
// 192.168.123.161:8082). The structs reproduce the public
// unitree_legged_sdk v3.2 comm.h packed layouts; the checksum reproduces
// the SDK's word-wise crc32_core. Implemented from the public protocol
// description — no SDK code is linked or vendored.
//
// The codec also performs the Unitree<->internal index swap the reference
// applies on both directions (HardwareInterface.cpp:27-28:
// swap_joint_indices = 3,4,5,0,1,2,9,10,11,6,7,8; swap_foot_indices =
// 1,0,3,2 — internal order is FL,FR,RL,RR; Unitree wire order is
// FR,FL,RR,RL), plus PositionLimit / PowerProtect equivalents of the SDK's
// Safety class the reference invokes before every send
// (HardwareInterface.cpp:113-115).

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

#pragma pack(push, 1)

struct Cartesian {
  float x, y, z;
};

struct IMU {                 // 53 bytes
  float quaternion[4];
  float gyroscope[3];
  float accelerometer[3];
  float rpy[3];
  int8_t temperature;
};

struct LED {                 // 3 bytes
  uint8_t r, g, b;
};

struct MotorState {          // 38 bytes
  uint8_t mode;
  float q;
  float dq;
  float ddq;
  float tauEst;
  float q_raw;
  float dq_raw;
  float ddq_raw;
  int8_t temperature;
  uint32_t reserve[2];
};

struct MotorCmd {            // 33 bytes
  uint8_t mode;
  float q;
  float dq;
  float tau;
  float Kp;
  float Kd;
  uint32_t reserve[3];
};

struct LowState {            // header 10 + 53 + 20*38 + 8 + 8 + 4 + 40 + 8
  uint8_t levelFlag;
  uint16_t commVersion;
  uint16_t robotID;
  uint32_t SN;
  uint8_t bandWidth;
  IMU imu;
  MotorState motorState[20];
  int16_t footForce[4];
  int16_t footForceEst[4];
  uint32_t tick;
  uint8_t wirelessRemote[40];
  uint32_t reserve;
  uint32_t crc;
};

struct LowCmd {
  uint8_t levelFlag;
  uint16_t commVersion;
  uint16_t robotID;
  uint32_t SN;
  uint8_t bandWidth;
  MotorCmd motorCmd[20];
  LED led[4];
  uint8_t wirelessRemote[40];
  uint32_t reserve;
  uint32_t crc;
};

struct HighCmd {
  uint8_t levelFlag;
  uint16_t commVersion;
  uint16_t robotID;
  uint32_t SN;
  uint8_t bandWidth;
  uint8_t mode;
  float forwardSpeed;
  float sideSpeed;
  float rotateSpeed;
  float bodyHeight;
  float footRaiseHeight;
  float yaw;
  float pitch;
  float roll;
  LED led[4];
  uint8_t wirelessRemote[40];
  uint8_t AppRemote[40];
  uint32_t reserve;
  uint32_t crc;
};

struct HighState {
  uint8_t levelFlag;
  uint16_t commVersion;
  uint16_t robotID;
  uint32_t SN;
  uint8_t bandWidth;
  uint8_t mode;
  IMU imu;
  float forwardSpeed;
  float sideSpeed;
  float rotateSpeed;
  float bodyHeight;
  float updownSpeed;
  float forwardPosition;
  float sidePosition;
  Cartesian footPosition2Body[4];
  Cartesian footSpeed2Body[4];
  Cartesian footPosition2World[4];
  Cartesian footSpeed2World[4];
  int16_t footForce[4];
  int16_t footForceEst[4];
  uint32_t tick;
  uint8_t wirelessRemote[40];
  uint8_t AppRemote[40];
  uint32_t reserve;
  uint32_t crc;
};

#pragma pack(pop)

constexpr uint8_t LEVEL_LOW = 0xff;   // LOWLEVEL
constexpr uint8_t LEVEL_HIGH = 0x00;  // HIGHLEVEL
constexpr uint8_t MOTOR_MODE_SERVO = 0x0A;  // PMSM servo mode

// internal FL,FR,RL,RR <-> wire FR,FL,RR,RL
// (reference: HardwareInterface.cpp:27-28)
constexpr int kJointSwap[12] = {3, 4, 5, 0, 1, 2, 9, 10, 11, 6, 7, 8};
constexpr int kFootSwap[4] = {1, 0, 3, 2};

// SDK crc32_core: MSB-first CRC-32/MPEG-2-style recurrence over 32-bit
// words, no final xor (the checksum every Unitree packet carries).
uint32_t crc32_core(const uint32_t *ptr, uint32_t len) {
  uint32_t crc = 0xFFFFFFFFu;
  const uint32_t poly = 0x04c11db7u;
  for (uint32_t i = 0; i < len; i++) {
    uint32_t xbit = 1u << 31;
    uint32_t data = ptr[i];
    for (int b = 0; b < 32; b++) {
      if (crc & 0x80000000u) {
        crc <<= 1;
        crc ^= poly;
      } else {
        crc <<= 1;
      }
      if (data & xbit) crc ^= poly;
      xbit >>= 1;
    }
  }
  return crc;
}

template <typename T>
void stamp_crc(T *pkt) {
  pkt->crc = crc32_core(reinterpret_cast<const uint32_t *>(pkt),
                        sizeof(T) / 4 - 1);
}

template <typename T>
bool check_crc(const T *pkt) {
  return pkt->crc == crc32_core(reinterpret_cast<const uint32_t *>(pkt),
                                sizeof(T) / 4 - 1);
}

// A1 joint position limits (rad), per joint type HAA/HFE/KFE
// (reference robot URDF limits; SDK Safety::PositionLimit equivalent)
constexpr float kQMin[3] = {-0.802f, -1.05f, -2.70f};
constexpr float kQMax[3] = {0.802f, 4.19f, -0.916f};
constexpr float kTauMax[3] = {33.5f, 33.5f, 33.5f};

}  // namespace

extern "C" {

int unitree_lowcmd_size() { return (int)sizeof(LowCmd); }
int unitree_lowstate_size() { return (int)sizeof(LowState); }
int unitree_highcmd_size() { return (int)sizeof(HighCmd); }
int unitree_highstate_size() { return (int)sizeof(HighState); }

uint32_t unitree_crc32(const uint8_t *data, int words) {
  return crc32_core(reinterpret_cast<const uint32_t *>(data),
                    (uint32_t)words);
}

// Encode a LOWLEVEL command. Inputs are 12-vectors in INTERNAL
// (FL,FR,RL,RR x HAA,HFE,KFE) order; the wire carries Unitree order.
// power_protect_level in [0,10] scales the SDK's PowerProtect torque
// budget (reference passes 10, HardwareInterface.cpp:114).
int unitree_lowcmd_encode(const float *q, const float *dq, const float *tau,
                          const float *kp, const float *kd,
                          const float *q_state, int power_protect_level,
                          uint8_t *out, int cap) {
  if (cap < (int)sizeof(LowCmd)) return -1;
  LowCmd cmd;
  std::memset(&cmd, 0, sizeof(cmd));
  cmd.levelFlag = LEVEL_LOW;
  for (int i = 0; i < 12; i++) {
    int w = kJointSwap[i];          // wire index for internal joint i
    MotorCmd &m = cmd.motorCmd[w];
    m.mode = MOTOR_MODE_SERVO;
    int jt = i % 3;
    // PositionLimit: clamp targets into the mechanical range
    float qc = q[i];
    if (qc < kQMin[jt]) qc = kQMin[jt];
    if (qc > kQMax[jt]) qc = kQMax[jt];
    // PowerProtect: scale the torque budget by level/10
    float tmax = kTauMax[jt] * (float)power_protect_level / 10.0f;
    float tc = tau[i];
    if (tc > tmax) tc = tmax;
    if (tc < -tmax) tc = -tmax;
    // guard the PD contribution too: if the commanded position step from
    // the measured state would exceed the torque budget, pull the target
    // toward the state (SDK Safety rejects such commands outright)
    if (q_state != nullptr && kp[i] > 0.0f) {
      float dq_max = tmax / kp[i];
      float dqc = qc - q_state[i];
      if (dqc > dq_max) qc = q_state[i] + dq_max;
      if (dqc < -dq_max) qc = q_state[i] - dq_max;
    }
    m.q = qc;
    m.dq = dq[i];
    m.tau = tc;
    m.Kp = kp[i];
    m.Kd = kd[i];
  }
  stamp_crc(&cmd);
  std::memcpy(out, &cmd, sizeof(cmd));
  return (int)sizeof(cmd);
}

// Decode a LOWLEVEL state packet into INTERNAL-order arrays.
// Returns 0 ok, -1 short, -2 level mismatch, -3 crc.
int unitree_lowstate_decode(const uint8_t *buf, int len, float *quat,
                            float *gyro, float *acc, float *q, float *dq,
                            float *tau_est, float *foot_force,
                            uint32_t *tick) {
  if (len < (int)sizeof(LowState)) return -1;
  LowState st;
  std::memcpy(&st, buf, sizeof(st));
  if (st.levelFlag != LEVEL_LOW) return -2;
  if (!check_crc(&st)) return -3;
  for (int i = 0; i < 4; i++) quat[i] = st.imu.quaternion[i];
  for (int i = 0; i < 3; i++) gyro[i] = st.imu.gyroscope[i];
  for (int i = 0; i < 3; i++) acc[i] = st.imu.accelerometer[i];
  for (int i = 0; i < 12; i++) {
    const MotorState &m = st.motorState[kJointSwap[i]];
    q[i] = m.q;
    dq[i] = m.dq;
    tau_est[i] = m.tauEst;
  }
  for (int i = 0; i < 4; i++)
    foot_force[i] = (float)st.footForce[kFootSwap[i]];
  if (tick) *tick = st.tick;
  return 0;
}

// Build a LOWLEVEL state packet (robot-side emulation, for loopback tests
// and the sim twin speaking the real wire format). Inputs internal order.
int unitree_lowstate_encode(const float *quat, const float *gyro,
                            const float *acc, const float *q,
                            const float *dq, const float *tau_est,
                            const float *foot_force, uint32_t tick,
                            uint8_t *out, int cap) {
  if (cap < (int)sizeof(LowState)) return -1;
  LowState st;
  std::memset(&st, 0, sizeof(st));
  st.levelFlag = LEVEL_LOW;
  for (int i = 0; i < 4; i++) st.imu.quaternion[i] = quat[i];
  for (int i = 0; i < 3; i++) st.imu.gyroscope[i] = gyro[i];
  for (int i = 0; i < 3; i++) st.imu.accelerometer[i] = acc[i];
  for (int i = 0; i < 12; i++) {
    MotorState &m = st.motorState[kJointSwap[i]];
    m.mode = MOTOR_MODE_SERVO;
    m.q = q[i];
    m.dq = dq[i];
    m.tauEst = tau_est[i];
  }
  for (int i = 0; i < 4; i++)
    st.footForce[kFootSwap[i]] = (int16_t)foot_force[i];
  st.tick = tick;
  stamp_crc(&st);
  std::memcpy(out, &st, sizeof(st));
  return (int)sizeof(st);
}

// Decode a LOWLEVEL command (robot-side emulation / loopback tests).
int unitree_lowcmd_decode(const uint8_t *buf, int len, float *q, float *dq,
                          float *tau, float *kp, float *kd) {
  if (len < (int)sizeof(LowCmd)) return -1;
  LowCmd cmd;
  std::memcpy(&cmd, buf, sizeof(cmd));
  if (cmd.levelFlag != LEVEL_LOW) return -2;
  if (!check_crc(&cmd)) return -3;
  for (int i = 0; i < 12; i++) {
    const MotorCmd &m = cmd.motorCmd[kJointSwap[i]];
    q[i] = m.q;
    dq[i] = m.dq;
    tau[i] = m.tau;
    kp[i] = m.Kp;
    kd[i] = m.Kd;
  }
  return 0;
}

// Encode a HIGHLEVEL walk command (reference: unitree_highlevel_ctrl maps
// joystick -> HighCmd at 100 Hz, unitree_highlevel_ctrl.cpp:73-185).
int unitree_highcmd_encode(uint8_t mode, float forward_speed,
                           float side_speed, float rotate_speed,
                           float body_height, float foot_raise_height,
                           float yaw, float pitch, float roll,
                           uint8_t *out, int cap) {
  if (cap < (int)sizeof(HighCmd)) return -1;
  HighCmd cmd;
  std::memset(&cmd, 0, sizeof(cmd));
  cmd.levelFlag = LEVEL_HIGH;
  cmd.mode = mode;
  cmd.forwardSpeed = forward_speed;
  cmd.sideSpeed = side_speed;
  cmd.rotateSpeed = rotate_speed;
  cmd.bodyHeight = body_height;
  cmd.footRaiseHeight = foot_raise_height;
  cmd.yaw = yaw;
  cmd.pitch = pitch;
  cmd.roll = roll;
  stamp_crc(&cmd);
  std::memcpy(out, &cmd, sizeof(cmd));
  return (int)sizeof(cmd);
}

// Decode a HIGHLEVEL state packet (proprioception republishing path,
// reference: unitree_highlevel_ctrl.cpp:34-36).
int unitree_highstate_decode(const uint8_t *buf, int len, float *quat,
                             float *gyro, float *acc, float *vel_body,
                             float *foot_force) {
  if (len < (int)sizeof(HighState)) return -1;
  HighState st;
  std::memcpy(&st, buf, sizeof(st));
  if (st.levelFlag != LEVEL_HIGH) return -2;
  if (!check_crc(&st)) return -3;
  for (int i = 0; i < 4; i++) quat[i] = st.imu.quaternion[i];
  for (int i = 0; i < 3; i++) gyro[i] = st.imu.gyroscope[i];
  for (int i = 0; i < 3; i++) acc[i] = st.imu.accelerometer[i];
  vel_body[0] = st.forwardSpeed;
  vel_body[1] = st.sideSpeed;
  vel_body[2] = st.updownSpeed;
  for (int i = 0; i < 4; i++)
    foot_force[i] = (float)st.footForce[kFootSwap[i]];
  return 0;
}

}  // extern "C"
